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

  /** Step-aligned epoch-second bucket of `tsCol` — the ONE bucketing
    * expression both the batch and streaming burn-rate twins use
    * ([[graft.streaming.SloStream]]); a fidelity change here changes
    * both in lockstep. */
  private[graft] def stepBucket(tsCol: String, stepSeconds: Long): Column =
    (floor(unix_timestamp(col(tsCol)) / stepSeconds) * stepSeconds)
      .cast("long")

  /** The trailing-window membership fan-out both twins share: a bucket
    * `b` enters window `w`'s trailing sums at steps b .. b+w−step. */
  private[graft] def memberSteps(bucket: Column, window: Column,
      stepSeconds: Long): Column =
    explode(sequence(bucket, bucket + window - lit(stepSeconds),
      lit(stepSeconds)))

  private[graft] def validateWindows(stepSeconds: Long,
      windows: Seq[Long]): Unit = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    require(windows.nonEmpty && windows.forall(w =>
      w >= stepSeconds && w % stepSeconds == 0),
      s"every window must be a positive multiple of step=$stepSeconds")
    require(windows.distinct.size == windows.size,
      s"windows must be distinct, got $windows — duplicate lengths " +
        "would collide on output column names")
  }

  /** Per-step trailing-window burn rates. For each window `w` in
    * `windows` (seconds, each a multiple of `stepSeconds`, all
    * distinct), emits `total_<w>s`, `err_<w>s`, and `burn_<w>s` =
    * (err/total)/budget (null where the window saw no events) on the
    * gap-filled step spine of the observed range. Buckets are
    * step-aligned epoch seconds; the trailing window at step B covers
    * buckets (B − w, B] — the Prometheus range-selector convention.
    *
    * The step-bucket count frame is persisted (two plan branches read
    * it; unpersisted each would replay the full source scan). Library
    * callers running inside a long-lived service should use
    * [[burnRatesReleasable]] and release after their action — the
    * plain entry point leaves the KB-scale cache to the session (the
    * Dedup multi-branch convention).
    */
  def burnRates(events: DataFrame, tsCol: String, isError: Column,
      stepSeconds: Long, windows: Seq[Long],
      errorBudget: Double): DataFrame =
    burnRatesReleasable(events, tsCol, isError, stepSeconds, windows,
      errorBudget)._1

  /** [[burnRates]] plus a release handle that unpersists the internal
    * bucket-count cache — call it AFTER the action that consumes the
    * frame. Repeated schedulers (e.g.
    * [[AlertRunner.evaluateBurnRate]]) must release, or each
    * evaluation leaks one cache entry. */
  def burnRatesReleasable(events: DataFrame, tsCol: String,
      isError: Column, stepSeconds: Long, windows: Seq[Long],
      errorBudget: Double): (DataFrame, () => Unit) = {
    validateWindows(stepSeconds, windows)
    // the ONLY pass over the data: map-side-combined counts per step
    // bucket, persisted for its two readers (spine bounds + fan-out).
    // The frame is ≤ range/step rows — KB-scale.
    val counts = events
      .select(stepBucket(tsCol, stepSeconds).as("__b"),
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
    // every window in ONE fan-out (the SloStream shape): each (bucket,
    // window) pair explodes to its member steps and one hash
    // aggregation sums every family conditionally — one shuffle total,
    // fan-out Σ⌈w/step⌉ per bucket row (query shape, not data)
    val slid = counts
      .withColumn("__w", explode(array(windows.map(lit(_)): _*)))
      .select(memberSteps(col("__b"), col("__w"), stepSeconds)
        .as("bucket"), col("__w"), col("__n"), col("__err"))
      .groupBy("bucket")
    val fams = windows.flatMap(w => Seq(
      sum(when(col("__w") === w, col("__n")).otherwise(0L))
        .as(s"total_${w}s"),
      sum(when(col("__w") === w, col("__err")).otherwise(0L))
        .as(s"err_${w}s")))
    val slidAgg = slid.agg(fams.head, fams.tail: _*)
    val out = windows
      .foldLeft(spine.join(slidAgg, Seq("bucket"), "left")) { (acc, w) =>
        acc.withColumn(s"total_${w}s",
          coalesce(col(s"total_${w}s"), lit(0L)))
          .withColumn(s"err_${w}s", coalesce(col(s"err_${w}s"), lit(0L)))
          .withColumn(s"burn_${w}s",
            when(col(s"total_${w}s") > 0,
              (col(s"err_${w}s").cast("double") / col(s"total_${w}s")) /
                errorBudget))
      }
    (out, () => { counts.unpersist(blocking = false); () })
  }

  /** The two-window policy: burn rates for (shortWindow, longWindow)
    * plus `firing` = 1 when BOTH exceed `threshold` STRICTLY (0
    * otherwise, including no-data steps). Note the strict `>`: the
    * count-threshold alert paths (`Alerts.evaluate` Above) fire on
    * `>=` — a burn exactly at threshold does NOT fire here. */
  def multiWindowAlert(events: DataFrame, tsCol: String, isError: Column,
      stepSeconds: Long, shortWindow: Long, longWindow: Long,
      errorBudget: Double, threshold: Double): DataFrame =
    multiWindowAlertReleasable(events, tsCol, isError, stepSeconds,
      shortWindow, longWindow, errorBudget, threshold)._1

  /** [[multiWindowAlert]] with the cache-release handle of
    * [[burnRatesReleasable]]. */
  def multiWindowAlertReleasable(events: DataFrame, tsCol: String,
      isError: Column, stepSeconds: Long, shortWindow: Long,
      longWindow: Long, errorBudget: Double, threshold: Double)
      : (DataFrame, () => Unit) = {
    require(shortWindow < longWindow,
      s"shortWindow ($shortWindow) must be strictly shorter than " +
        s"longWindow ($longWindow)")
    val (rates, release) = burnRatesReleasable(events, tsCol, isError,
      stepSeconds, Seq(shortWindow, longWindow), errorBudget)
    (rates.withColumn("firing",
      when(col(s"burn_${shortWindow}s") > threshold &&
        col(s"burn_${longWindow}s") > threshold, 1L).otherwise(0L)),
      release)
  }
}
