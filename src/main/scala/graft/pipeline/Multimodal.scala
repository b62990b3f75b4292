package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns plus a typed metadata
  * struct; decode / feature-extract / resize / frame-sample are expressed
  * as real Spark transformations with a DETERMINISTIC STUB in place of the
  * actual codec (no image/audio libraries in this environment — the
  * Spark-side schema, partitioning, and batch shape are the real thing; the
  * pixel math is not).
  */
object Multimodal {

  /** media metadata struct: kind ∈ {image, audio, video}. */
  def mediaMeta(kind: Column, width: Column, height: Column,
      durationMs: Column): Column =
    struct(kind.as("kind"), width.as("width"), height.as("height"),
      durationMs.as("duration_ms"), lit(null).cast("string").as("codec"))

  /** STUB decode → fixed-size feature vector: deterministic pseudo-features
    * derived from content hashes (stands in for a real image encoder; same
    * schema and batch shape). */
  def featureVectorStub(media: Column, dim: Int = 16): Column =
    array((0 until dim).map(i =>
      (pmod(xxhash64(media, lit(i)), lit(1000L)).cast("double") / 500.0)
        - 1.0): _*)

  /** STUB resize: metadata-only transform (a real implementation would
    * rewrite bytes; the pipeline contract — new meta, same binary column
    * type — is what downstream operators consume). */
  def resizeStub(meta: Column, w: Int, h: Int): Column =
    struct(meta.getField("kind").as("kind"), lit(w).as("width"),
      lit(h).as("height"), meta.getField("duration_ms").as("duration_ms"),
      meta.getField("codec").as("codec"))

  /** STUB frame sampling: n pseudo-frames sliced from the binary payload —
    * exercises the explode / per-frame fan-out shape real video pipelines
    * have. */
  def frameSampleStub(media: Column, n: Int = 4): Column =
    array((0 until n).map(i =>
      substring(media, i * 16 + 1, 16)): _*)

  /** Size-aware layout: large blobs skew partitions badly at scale; range
    * partitioning on payload size spreads them. */
  def balanceBySize(df: DataFrame, mediaCol: String,
      partitions: Int): DataFrame =
    df.repartitionByRange(partitions, length(col(mediaCol)))

  /** End-to-end stub pipeline over a media frame:
    * (id, media, meta) → per-frame features, one row per sampled frame. */
  def extractFrameFeatures(df: DataFrame, idCol: String, mediaCol: String,
      frames: Int = 4, dim: Int = 16): DataFrame =
    df.select(col(idCol).as("media_id"),
      posexplode(frameSampleStub(col(mediaCol), frames))
        .as(Seq("frame_idx", "frame")))
      .withColumn("features", featureVectorStub(col("frame"), dim))
      .drop("frame")
}
