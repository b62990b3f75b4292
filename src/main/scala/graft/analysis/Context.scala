package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** "Show surrounding events" — the log-viewer context query: for each
  * anchor row (a clicked log line, every error, ...), the `before`
  * nearest rows at-or-before it and the `after` nearest rows after it
  * in (ts, tie) stream order, bounded to ±`maxSpanSec` of the anchor.
  *
  * The span bound is what makes the neighbor query distributed: exact
  * "N previous rows" with no time bound needs a total order over the
  * corpus (single-task), while every real context view is time-bounded
  * anyway. Candidates come from the SAME bucketed band join the
  * interval algebra uses ([[Intervals.overlapJoin]] — anchors become
  * ±span intervals, rows become instants), then ONE per-anchor window
  * ordering assigns stream positions and the offset falls out as
  * position − anchor position. Per-anchor work is bounded by the rows
  * inside its span (the hot-anchor caveat every per-key window
  * shares), never by corpus size. */
object Context {

  /** Output: every `anchors` column, every `rows` column (names must be
    * disjoint), and `offset` — 0 for the anchor row itself, −k for the
    * k-th row before, +k for the k-th after. `tieCol` must be unique
    * within `rows` (a row id): it makes the stream order total and
    * identifies the anchor row when anchors are drawn from `rows`; an
    * anchor with no exactly-matching row still gets its neighbors
    * (offsets ±k, no 0 row). */
  def around(rows: DataFrame, tsCol: String, tieCol: String,
      anchors: DataFrame, aTsCol: String, aTieCol: String,
      before: Int, after: Int, maxSpanSec: Long,
      bucketSeconds: Long = 60L): DataFrame = {
    require(before >= 0 && after >= 0, "before/after must be non-negative")
    require(maxSpanSec > 0, "maxSpanSec must be positive")
    val dup = rows.columns.toSet.intersect(anchors.columns.toSet)
    require(dup.isEmpty,
      s"around requires disjoint column names; shared: $dup")
    // overlapJoin is half-open ([s, e) — zero-length intervals match
    // nothing), so a row at second t is the unit interval [t, t+1) and
    // the anchor window [ats − span, ats + span + 1) keeps every row
    // with |t − ats| ≤ span, both ends inclusive
    val a = anchors
      .withColumn("__ats", unix_timestamp(col(aTsCol)))
      .withColumn("__as", col("__ats") - maxSpanSec)
      .withColumn("__ae", col("__ats") + maxSpanSec + 1)
    val r = rows
      .withColumn("__rts", unix_timestamp(col(tsCol)))
      .withColumn("__re", col("__rts") + 1)
    // both sides' interval lengths are statically known (2·span+1 and
    // 1 s), so the fan-out bound is checked here instead of paying
    // overlapJoin's two audit scan jobs
    require((2 * maxSpanSec + 1) / bucketSeconds + 1 <= 100000L,
      s"anchor window spans too many $bucketSeconds s buckets: raise " +
        "bucketSeconds")
    val cand = Intervals.overlapJoin(a, r, "__as", "__ae", "__rts", "__re",
      bucketSeconds, auditFanOut = false)
    val isBefore = col("__rts") < col("__ats") ||
      (col("__rts") === col("__ats") && col(tieCol) < col(aTieCol))
    val isAnchor = col("__rts") === col("__ats") &&
      col(tieCol) === col(aTieCol)
    val w = Window.partitionBy(col("__ats"), col(aTieCol))
    // one total ordering per anchor: offset = position − anchor position
    val idx = row_number().over(
      w.orderBy(col("__rts").asc, col(tieCol).asc))
    val nBefore = sum(when(isBefore, 1).otherwise(0)).over(w)
    val anchorPresent = max(when(isAnchor, 1).otherwise(0)).over(w)
    cand
      .withColumn("offset",
        when(isAnchor, 0)
          .when(isBefore, idx - nBefore - 1)
          .otherwise(idx - nBefore - anchorPresent))
      .filter(col("offset") >= -before && col("offset") <= after)
      .drop("__ats", "__as", "__ae", "__rts", "__re", "overlap_seconds")
  }
}
