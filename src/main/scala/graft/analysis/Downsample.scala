package graft.analysis

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chart downsampling — what a dashboard renders when a series has far
  * more points than the chart has pixels:
  *
  *  - [[m4]]: the M4 aggregation (Jugel et al., VLDB 2014) — per pixel
  *    column keep first/last/min/max, the exact set that makes a
  *    width×height line rendering pixel-identical to drawing every raw
  *    point. Pure groupBy: one hash shuffle with map-side combine,
  *    codegen'd min/max/min_by/max_by — the scale path.
  *  - [[lttb]]: Largest-Triangle-Three-Buckets (Steinarsson 2013, the
  *    downsampler Grafana ships) — picks the visually dominant point
  *    per bucket by maximizing triangle area with the previously kept
  *    point and the next bucket's centroid. The recurrence is
  *    inherently sequential per series, so each series' points gather
  *    into one task (the CUSUM/funnel per-key pattern) and the kernel
  *    runs once per series; series parallelize freely. Per-series state
  *    is the series' points in the charted range — LTTB's own contract
  *    (it exists to shrink exactly that set), typically range/step
  *    rows; use [[m4]] when single series are shuffle-heavy.
  *
  * Both are deterministic: ties break on (ts, tie) ordering, never on
  * partitioning. */
object Downsample {

  /** Range filter on the raw timestamp column, not unix_timestamp(ts):
    * the former reaches the parquet scan as PushedFilters (row-group
    * min/max pruning — THE lever for a charted slice of 100 TB), the
    * latter stays a post-scan Filter. Equivalent to epoch-second
    * comparison because bucket widths here are whole seconds. */
  private def rangeFiltered(df: DataFrame, tsCol: String, fromSec: Long,
      toSec: Long): DataFrame =
    df.filter(col(tsCol) >= lit(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(fromSec))) &&
      col(tsCol) < lit(java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(toSec))))

  /** Pixel-column index for a timestamp: floor((t−from)/width) clamped
    * to [0, pixels). `from`/`to` are epoch seconds; rows outside
    * [from, to) are dropped. */
  private def bucketCol(tsSec: org.apache.spark.sql.Column, from: Long,
      to: Long, pixels: Int) =
    least(floor((tsSec - from) * pixels / (to - from)), lit(pixels - 1))
      .cast("long")

  /** The M4 aggregate set over one cell — shared by the batch operator
    * and the streaming twin so their first/last semantics cannot drift.
    * The order key is (FLOORED second, tie): second-resolution stream
    * order with the tie column deciding within a second — deterministic
    * and replayable by engines that compare epoch seconds. */
  private[graft] def m4Aggs(valCol: String, tsCol: String,
      tieCol: String): Seq[org.apache.spark.sql.Column] = {
    val orderKey = struct(unix_timestamp(col(tsCol)), col(tieCol))
    Seq(count(lit(1)).as("n"),
      min_by(col(valCol), orderKey).as("first_v"),
      max_by(col(valCol), orderKey).as("last_v"),
      min(col(valCol)).as("min_v"),
      max(col(valCol)).as("max_v"))
  }

  /** M4 per (series, pixel): row count, first/last value by (ts, tie)
    * order, min/max value. `tieCol` makes first/last deterministic when
    * timestamps collide (pass a unique id). */
  def m4(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      valCol: String, tieCol: String, fromSec: Long, toSec: Long,
      pixels: Int): DataFrame = {
    require(pixels > 0, "pixels must be positive")
    require(toSec > fromSec, s"need from < to, got $fromSec / $toSec")
    val t = unix_timestamp(col(tsCol))
    val aggs = m4Aggs(valCol, tsCol, tieCol)
    rangeFiltered(df, tsCol, fromSec, toSec)
      .groupBy((seriesCols.map(col) :+
        bucketCol(t, fromSec, toSec, pixels).as("pixel")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** LTTB kernel over one series' time-ordered points: always keeps the
    * first and last point; each interior bucket keeps the point with
    * the largest triangle area against the previously kept point and
    * the NEXT bucket's centroid. Strict `>` comparison = first point
    * wins ties, the reference implementation's rule. */
  private[analysis] def lttbKernel(pts: Array[(Double, Double)],
      threshold: Int): Array[(Double, Double)] = {
    val n = pts.length
    if (threshold >= n || threshold < 3) return pts
    val out = Array.newBuilder[(Double, Double)]
    out.sizeHint(threshold)
    // bucket i (of threshold-2 interior buckets) covers the half-open
    // index range [1 + i*step, 1 + (i+1)*step) over the interior points
    val step = (n - 2).toDouble / (threshold - 2)
    out += pts(0)
    var prev = pts(0)
    var i = 0
    while (i < threshold - 2) {
      val lo = 1 + math.floor(i * step).toInt
      val hi = math.min(1 + math.floor((i + 1) * step).toInt, n - 1)
      // next bucket's centroid (the last "bucket" is the final point)
      val nlo = hi
      val nhi = if (i == threshold - 3) n else math.min(
        1 + math.floor((i + 2) * step).toInt, n - 1)
      var ax = 0.0; var ay = 0.0; var m = 0
      var j = nlo
      while (j < math.max(nhi, nlo + 1) && j < n) {
        ax += pts(j)._1; ay += pts(j)._2; m += 1; j += 1
      }
      ax /= m; ay /= m
      var best = pts(lo); var bestArea = -1.0
      j = lo
      while (j < hi) {
        val area = math.abs(
          (prev._1 - ax) * (pts(j)._2 - prev._2) -
            (prev._1 - pts(j)._1) * (ay - prev._2))
        if (area > bestArea) { bestArea = area; best = pts(j) }
        j += 1
      }
      out += best
      prev = best
      i += 1
    }
    out += pts(n - 1)
    out.result()
  }

  /** LTTB per series: downsample each series' points in [fromSec,
    * toSec) epoch-seconds to at most `threshold` points. Output:
    * series columns + (t, v) of each kept point, in time order.
    * Duplicate timestamps order by value (deterministic). */
  def lttb(df: DataFrame, seriesCols: Seq[String], tsCol: String,
      valCol: String, fromSec: Long, toSec: Long,
      threshold: Int): DataFrame = {
    require(threshold >= 3, s"threshold must be >= 3, got $threshold")
    require(toSec > fromSec, s"need from < to, got $fromSec / $toSec")
    val t = unix_timestamp(col(tsCol))
    val grouped = rangeFiltered(df, tsCol, fromSec, toSec)
      .groupBy(seriesCols.map(col): _*)
      .agg(sort_array(collect_list(struct(t.cast("double").as("t"),
        col(valCol).cast("double").as("v")))).as("__pts"))
    val kernel = udf((pts: Seq[Row]) =>
      lttbKernel(pts.map(r => (r.getDouble(0), r.getDouble(1))).toArray,
        threshold).map { case (a, b) => (a, b) })
    grouped
      .select((seriesCols.map(col) :+
        posexplode(kernel(col("__pts"))).as(Seq("__i", "__p"))): _*)
      .select((seriesCols.map(col) :+ col("__i").as("idx") :+
        col("__p._1").as("t") :+ col("__p._2").as("v")): _*)
  }
}
