package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("frame fan-out and deterministic feature extraction") {
    val df = Seq(
      (1L, "0123456789abcdef0123456789abcdef0123456789abcdef0123456789abcdef"),
      (2L, "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"))
      .toDF("id", "hex")
      .withColumn("media", col("hex").cast("binary"))
      .withColumn("meta", Multimodal.mediaMeta(lit("video"), lit(640),
        lit(480), lit(2000)))
    val out = Multimodal.extractFrameFeatures(df, "id", "media",
      frames = 4, dim = 8)
    val rows = out.collect()
    assert(rows.length == 8) // 2 media × 4 frames
    def feats(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getSeq[Double](r.fieldIndex("features"))
    assert(rows.forall(feats(_).length == 8))
    // determinism: same content → same features
    val again = Multimodal.extractFrameFeatures(df, "id", "media", 4, 8)
      .collect()
    assert(rows.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
    // features bounded in [-1, 1)
    assert(rows.flatMap(feats).forall(v => v >= -1.0 && v < 1.0))
  }

  test("resize keeps kind, updates dims; size balancing partitions") {
    val df = Seq((1L, "abc"), (2L, "defghij"), (3L, "x"), (4L, "yz0123"))
      .toDF("id", "s")
      .withColumn("media", col("s").cast("binary"))
      .withColumn("meta", Multimodal.mediaMeta(lit("image"), lit(100),
        lit(100), lit(0)))
      .withColumn("meta2", Multimodal.resizeStub(col("meta"), 224, 224))
    val r = df.select(col("meta2.kind"), col("meta2.width")).head()
    assert(r.getString(0) == "image" && r.getInt(1) == 224)
    val balanced = Multimodal.balanceBySize(df, "media", 2)
    assert(balanced.rdd.getNumPartitions == 2)
  }
}
