package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-window SLO burn-rate evaluation (the Google SRE-workbook
  * alerting policy): at every step, the error ratio over each trailing
  * window divided by the error budget; an alert fires only when EVERY
  * window's burn rate exceeds the threshold — the long window provides
  * the sustained-burn evidence, the short window de-asserts quickly
  * after recovery.
  *
  * The reference's alerting evaluates single tumbling windows
  * (packages/api/src/tasks/checkAlerts — threshold over the chart
  * window); the multi-window burn-rate shape is what its users build on
  * top with PromQL dashboards. Here it is a first-class operator over
  * any event frame.
  *
  * Plan shape (the PromQL sliding-window plan, `metrics/PromQl.scala`
  * explode-to-steps): raw events collapse FIRST to one row per step
  * bucket (map-side-combined count shuffle — the only pass over the
  * data); each bucket row then fans out to the ⌈window/step⌉ steps whose
  * trailing window it enters, and a second hash aggregation sums per
  * step. Fan-out is a query-shape constant (window/step), never data
  * volume, and it operates on the bucket frame (≤ time-range/step rows),
  * not the corpus. At 100 TB the event scan dominates and the window
  * machinery is bounded by the dashboard's time range.
  */
object Slo {

  /** Per-step trailing-window burn rates. For each window `w` in
    * `windows` (seconds, each a multiple of `stepSeconds`), emits
    * `total_<w>s`, `err_<w>s`, and `burn_<w>s` = (err/total)/budget
    * (null where the window saw no events) on the gap-filled step spine
    * of the observed range. Buckets are step-aligned epoch seconds; the
    * trailing window at step B covers buckets (B − w, B] — the
    * Prometheus range-selector convention.
    */
  def burnRates(events: DataFrame, tsCol: String, isError: Column,
      stepSeconds: Long, windows: Seq[Long],
      errorBudget: Double): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    require(windows.nonEmpty && windows.forall(w =>
      w >= stepSeconds && w % stepSeconds == 0),
      s"every window must be a positive multiple of step=$stepSeconds")
    // the ONLY pass over the data: map-side-combined counts per step
    // bucket. Persisted because two branches read it (spine bounds +
    // window fan-out); unpersisted the 100-TB scan and its shuffle
    // replay per branch. The frame is ≤ range/step rows — KB-scale —
    // and stays resident until the caller's clearCache (the Dedup
    // multi-branch convention).
    val counts = events
      .select((floor(unix_timestamp(col(tsCol)) / stepSeconds) *
        stepSeconds).cast("long").as("__b"),
        when(isError, 1L).otherwise(0L).as("__e"))
      .groupBy("__b")
      .agg(count(lit(1)).as("__n"), sum(col("__e")).as("__err"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the step spine: one aggregated (min, max) row exploded to the
    // full grid — O(range/step) rows from a one-row frame
    val spine = counts
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"),
        lit(stepSeconds))).as("bucket"))
    // every window in ONE fan-out (the SloStream shape): bucket b's
    // counts enter window w's trailing sums for steps b..b+w−step, so
    // each (bucket, window) pair explodes to its member steps and one
    // hash aggregation sums every family conditionally — one shuffle
    // total, fan-out Σ⌈w/step⌉ per bucket row (query shape, not data)
    val slid = counts
      .withColumn("__w", explode(array(windows.map(lit(_)): _*)))
      .select(explode(sequence(col("__b"),
        col("__b") + col("__w") - lit(stepSeconds),
        lit(stepSeconds))).as("bucket"),
        col("__w"), col("__n"), col("__err"))
      .groupBy("bucket")
    val fams = windows.flatMap(w => Seq(
      sum(when(col("__w") === w, col("__n")).otherwise(0L))
        .as(s"total_${w}s"),
      sum(when(col("__w") === w, col("__err")).otherwise(0L))
        .as(s"err_${w}s")))
    val slidAgg = slid.agg(fams.head, fams.tail: _*)
    windows.foldLeft(spine.join(slidAgg, Seq("bucket"), "left")) {
      (acc, w) =>
        acc.withColumn(s"total_${w}s",
          coalesce(col(s"total_${w}s"), lit(0L)))
          .withColumn(s"err_${w}s", coalesce(col(s"err_${w}s"), lit(0L)))
          .withColumn(s"burn_${w}s",
            when(col(s"total_${w}s") > 0,
              (col(s"err_${w}s").cast("double") / col(s"total_${w}s")) /
                errorBudget))
    }
  }

  /** The two-window policy: burn rates for (shortWindow, longWindow)
    * plus `firing` = 1 when BOTH exceed `threshold` (0 otherwise,
    * including no-data steps). */
  def multiWindowAlert(events: DataFrame, tsCol: String, isError: Column,
      stepSeconds: Long, shortWindow: Long, longWindow: Long,
      errorBudget: Double, threshold: Double): DataFrame =
    burnRates(events, tsCol, isError, stepSeconds,
      Seq(shortWindow, longWindow), errorBudget)
      .withColumn("firing",
        when(col(s"burn_${shortWindow}s") > threshold &&
          col(s"burn_${longWindow}s") > threshold, 1L).otherwise(0L))
}
