package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.{EventDeltas, Patterns}

/** Sidecar analysis libraries exposed through the driver contract
  * (DRAIN pattern mining and event-delta outlier attribution). Both are
  * deterministic but not SQL-expressible → rows-only checks; semantics are
  * covered by AnalysisSpec. */
object AnalysisQueries {

  /** DRAIN template mining over the documents corpus (deterministic
    * hash-ordered sample, reference mine-patterns.ts:91-204). */
  def q30_patterns(spark: SparkSession, dir: String): DataFrame = {
    val d = Queries.cat(spark, dir)("documents").df
    Patterns.minePatterns(spark, d, "text", "doc_id", sampleSize = 2000)
  }

  /** Event-delta attribution: which (column, value) pairs are
    * over-represented among high-value events (reference eventDeltas.ts). */
  def q31_event_deltas(spark: SparkSession, dir: String): DataFrame = {
    val e = Queries.cat(spark, dir)("events").df
      .withColumn("hour", hour(col("ts")))
    EventDeltas.explain(e, col("value") > 190,
      Seq("event_type", "hour", "user_id"))
      .withColumn("outlier_pct", round(col("outlier_pct"), 6))
      .withColumn("inlier_pct", round(col("inlier_pct"), 6))
      .withColumn("score", round(col("score"), 6))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_patterns" -> (q30_patterns _),
    "q31_event_deltas" -> (q31_event_deltas _))
}
