package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-delta outlier attribution (reference
  * packages/common-utils/src/core/eventDeltas.ts): given an *outlier* row
  * set and an *inlier* row set, rank property (column, value) pairs by how
  * much more frequent they are among outliers — the "what changed"
  * explanation for a latency/error spike.
  *
  * The reference samples rows client-side and computes distributions in TS;
  * here the distributions are DataFrame aggregations (scales to the full
  * data) and only the tiny scored table is collected.
  */
object EventDeltas {

  /** OTel-ish semantic boost / denylist (reference eventDeltas.ts:268-293,
    * 189-221): ids and timestamps are noise; a few semantic keys rank up. */
  val DenylistSubstrings: Seq[String] =
    Seq("id", "time", "timestamp", "uuid", "date")
  val BoostKeys: Set[String] =
    Set("statuscode", "severitytext", "event_type", "level", "status")

  /** Score columns' values: for each (column, value),
    * outlierPct - inlierPct, ranked desc. High-cardinality keys
    * (> uniqueness 0.9 among outliers) are dropped like the reference. */
  def rankProperties(outliers: DataFrame, inliers: DataFrame,
      columns: Seq[String], maxValuesPerKey: Int = 20,
      uniquenessCap: Double = 0.9): DataFrame = {
    def melted(df: DataFrame): DataFrame = {
      val pairs = columns.flatMap(c =>
        Seq(lit(c), col(c).cast("string")))
      df.select(explode(map(pairs: _*)).as(Seq("key", "value")))
        .filter(col("value").isNotNull)
    }
    val oCount = outliers.count().toDouble.max(1)
    val iCount = inliers.count().toDouble.max(1)
    val o = melted(outliers).groupBy("key", "value")
      .agg(count(lit(1)).as("o_cnt"))
    val i = melted(inliers).groupBy("key", "value")
      .agg(count(lit(1)).as("i_cnt"))
    // high-cardinality keys: distinct values ≈ outlier rows → ids, drop
    val cardinality = o.groupBy("key")
      .agg(countDistinct(col("value")).as("n_distinct"))
      .filter(col("n_distinct") < lit(uniquenessCap * oCount))
      .select("key")
    val denyl = DenylistSubstrings
    val keyAllowed = !denyl
      .map(s => lower(col("key")).contains(s))
      .reduce((a: Column, b: Column) => a || b)
    val scored = o.join(i, Seq("key", "value"), "full_outer")
      .na.fill(0, Seq("o_cnt", "i_cnt"))
      .join(broadcast(cardinality), Seq("key"), "left_semi")
      .filter(keyAllowed)
      .withColumn("outlier_pct", col("o_cnt") / oCount)
      .withColumn("inlier_pct", col("i_cnt") / iCount)
      .withColumn("delta", col("outlier_pct") - col("inlier_pct"))
      .withColumn("boost",
        when(lower(col("key")).isin(BoostKeys.toSeq: _*), 1).otherwise(0))
      .withColumn("score",
        col("delta") * (lit(1.0) + col("boost") * 0.5))
    scored
      .select("key", "value", "o_cnt", "i_cnt", "outlier_pct",
        "inlier_pct", "score")
      .orderBy(desc("score"), col("key"), col("value"))
      .limit(maxValuesPerKey * columns.length)
  }

  /** Convenience: split one frame into outlier/inlier sets by a predicate
    * and rank. */
  def explain(df: DataFrame, outlierPredicate: Column,
      columns: Seq[String]): DataFrame =
    rankProperties(df.filter(outlierPredicate),
      df.filter(!outlierPredicate), columns)
}
