package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-timeout sessionization: group each key's events into sessions
  * where a new session starts when the inter-event gap exceeds the
  * timeout — the batch analogue of the reference's session-replay
  * grouping (docker/otel-collector/schema/seed/00004_hyperdx_sessions
  * .sql groups rrweb events by rum.sessionId; this derives sessions
  * when no instrumented id exists).
  *
  * Plan: one hash shuffle on the keys, then a single window pass —
  * lag-gap flag → running sum = session ordinal. No joins, no
  * amplification; per-key rows must fit a partition's sort (the usual
  * window caveat — hot keys salt upstream). For unbounded streams use
  * [[graft.streaming.Streaming.sessionRollup]] (Spark's native
  * session_window with watermark-bounded state) instead.
  */
object Sessionize {

  /** Append a per-key 1-based session ordinal (`sessionCol`). Events at
    * identical timestamps always share a session regardless of sort-tie
    * order: the gap flag compares timestamps, so ties contribute gap 0
    * and the running sum uses the default RANGE frame (ties see the
    * same cumulative value). */
  def byGap(df: DataFrame, timeCol: String, keys: Seq[String],
      gapSeconds: Double, sessionCol: String = "session_id")
      : DataFrame = {
    require(keys.nonEmpty, "sessionization needs at least one key")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
    val secs = col(timeCol).cast("double")
    val gap = secs - lag(secs, 1).over(w)
    df.withColumn("__brk",
        when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn(sessionCol, sum(col("__brk")).over(w))
      .drop("__brk")
  }

  /** One row per session: keys…, session_start/session_end timestamps,
    * and the event count. */
  def sessions(df: DataFrame, timeCol: String, keys: Seq[String],
      gapSeconds: Double): DataFrame =
    byGap(df, timeCol, keys, gapSeconds)
      .groupBy((keys.map(col) :+ col("session_id")): _*)
      .agg(
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).as("events"))
      .drop("session_id")
}
