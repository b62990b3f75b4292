package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonal-profile anomaly detection over event throughput: each
  * (group, time-bucket) count is z-scored against that group's
  * profile for the bucket's season cell (hour-of-day by default) —
  * "is this 3 AM hour unusual FOR a 3 AM hour", the diurnal-baseline
  * upgrade of a flat threshold. A fixed threshold misses a nightly
  * batch job's quiet window and a rolling band (q107's PromQL
  * anomaly) adapts too fast to flag a whole anomalous day; the
  * seasonal profile compares each hour against the same clock hour
  * across the full range.
  *
  * The reference alerts on flat thresholds over chart windows
  * (packages/api/src/tasks/checkAlerts/index.ts) and its anomaly
  * roadmap is rolling bands; the seasonal-baseline shape is what its
  * users hand-build with PromQL `offset 1d/7d` overlays
  * (packages/common-utils/src/core/renderChartConfig.ts time-offset
  * charts). Here it is one operator.
  *
  * Plan shape at 100 TB: raw rows collapse FIRST to (keys, bucket)
  * integer counts — the only pass over the data, one hash aggregate.
  * The bucket spine is then gap-filled per key (a missing hour is a
  * zero-count observation, not absent evidence — without this the
  * profile only ever sees busy hours and quiet-hour anomalies are
  * invisible): distinct keys × a `sequence()` spine, both frames
  * orders of magnitude smaller than the data. Profile moments
  * (n, Σx, Σx²) reduce the per-bucket counts by (keys, season cell) —
  * ≤ 24·|keys| cells — and broadcast-join back onto the counts.
  * Nothing after the first aggregate ever touches raw rows.
  *
  * Float discipline (cross-engine oracle parity): counts are exact
  * integers, so the moments are exact; mean and variance are computed
  * with one explicit expression shape — mean = s/n,
  * var = (ss − s·s/n)/(n−1), z = (x − mean)/sqrt(var) — that an
  * independent engine reproduces bit-identically from the same
  * integer sums (single-pass stddev built-ins are NOT portable across
  * engines; explicit moments are).
  */
object Seasonal {

  /** Per-(keys, bucket) event counts z-scored against the
    * (keys, hour-of-day) seasonal profile.
    *
    * Output: keys…, `bucket` (epoch seconds), `hod` (0–23, UTC — the
    * clock hour of the bucket START), `cnt`, `mean`, `z` (null when
    * the cell has < 2 observations or zero variance), `anomaly`
    * (|z| ≥ `zThreshold`, null when z is).
    *
    * @param stepSeconds bucket width; must divide 86400 (stable
    *        day-position → season-cell map) and additionally either
    *        divide 3600 (sub-hour buckets lie inside one clock hour)
    *        or be a multiple of it (hour-aligned buckets start on a
    *        clock hour) — a 5400-s bucket would straddle clock hours
    *        and make `hod` a lie.
    */
  def hourOfDayAnomalies(df: DataFrame, tsCol: String,
      keyCols: Seq[String], stepSeconds: Long = 3600L,
      zThreshold: Double = 3.0): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group key")
    require(stepSeconds > 0 && 86400L % stepSeconds == 0 &&
      (3600L % stepSeconds == 0 || stepSeconds % 3600L == 0),
      s"stepSeconds (got $stepSeconds) must divide 86400 and either " +
        "divide 3600 or be a multiple of it, so each bucket maps to " +
        "one hour-of-day cell")
    val keys = keyCols.map(col)

    // one pass over the data: (keys, bucket) counts
    val bucket = (floor(unix_timestamp(col(tsCol)) / stepSeconds) *
      stepSeconds).cast("long")
    val counts = df
      .groupBy(keys :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

    // gap-filled spine: every key gets every bucket in the observed
    // range; absent cells are zero-count observations
    val bounds = counts.agg(min("bucket").as("lo"), max("bucket").as("hi"))
    val spine = bounds.select(explode(sequence(col("lo"), col("hi"),
      lit(stepSeconds))).as("bucket"))
    // key set derived from the aggregate-sized counts frame, NOT the
    // raw data — the first aggregate stays the only raw-data pass
    val keySet = counts.select(keys: _*).distinct()
    val dense = keySet.crossJoin(spine)
      .join(counts, keyCols :+ "bucket", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      // pmod, not %: a pre-1970 bucket's signed remainder would label
      // the same clock hour -1 instead of 23
      .withColumn("hod",
        floor(pmod(col("bucket"), lit(86400L)) / 3600L).cast("int"))

    // seasonal moments per (keys, hour-of-day) — exact integer sums
    val prof = dense.groupBy(keys :+ col("hod"): _*)
      .agg(count(lit(1)).as("n"), sum("cnt").as("s"),
        sum(col("cnt") * col("cnt")).as("ss"))

    val mean = col("s").cast("double") / col("n")
    val variance = (col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("n")) /
      (col("n") - 1)
    dense.join(broadcast(prof), keyCols :+ "hod")
      .withColumn("mean", mean)
      .withColumn("z",
        when(col("n") > 1 && variance > 0,
          (col("cnt").cast("double") - mean) / sqrt(variance)))
      .withColumn("anomaly",
        when(col("z").isNotNull, abs(col("z")) >= zThreshold))
      .select(keys ++ Seq(col("bucket"), col("hod"), col("cnt"),
        col("mean"), col("z"), col("anomaly")): _*)
  }
}
