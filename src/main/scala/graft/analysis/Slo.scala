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
    val counts = events
      .select((floor(unix_timestamp(col(tsCol)) / stepSeconds) *
        stepSeconds).cast("long").as("__b"),
        when(isError, 1L).otherwise(0L).as("__e"))
      .groupBy("__b")
      .agg(count(lit(1)).as("__n"), sum(col("__e")).as("__err"))
    // the step spine: one aggregated (min, max) row exploded to the
    // full grid — O(range/step) rows from a one-row frame
    val spine = counts
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"),
        lit(stepSeconds))).as("bucket"))
    windows.foldLeft(spine) { (acc, w) =>
      val k = (w / stepSeconds).toInt
      // bucket b's counts enter the trailing windows of steps
      // b .. b+(k−1)·step — bounded fan-out, then one hash agg per step
      val slid = counts
        .select(explode(sequence(col("__b"),
          col("__b") + lit((k - 1) * stepSeconds),
          lit(stepSeconds))).as("bucket"),
          col("__n"), col("__err"))
        .groupBy("bucket")
        .agg(sum(col("__n")).as(s"total_${w}s"),
          sum(col("__err")).as(s"err_${w}s"))
      acc.join(slid, Seq("bucket"), "left")
        .withColumn(s"total_${w}s",
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
