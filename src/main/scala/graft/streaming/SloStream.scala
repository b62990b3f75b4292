package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous multi-window SLO burn-rate evaluation — the streaming twin
  * of [[graft.analysis.Slo]] (Google SRE-workbook policy: alert only
  * when BOTH the short and long trailing windows burn the error budget
  * above threshold).
  *
  * ONE stateful operator. Sliding windows normally force either two
  * separate streaming aggregations (unsupported chained state) or
  * Spark's built-in sliding `window()` per length (two stateful ops
  * again). Instead, each event explodes to its (window-length,
  * step-cell) memberships with a SYNTHETIC event time = the step-cell
  * time, and one watermarked tumbling aggregation per cell sums each
  * family conditionally. The burn math is stateless projection after
  * the agg.
  *
  * Watermark accounting: contributions carry step times up to
  * (longWindow − step) ahead of their event's own bucket, so the
  * engine-observed max event time runs that far ahead of real ingest
  * time; the declared delay is therefore `lateness + longWindow − step`,
  * which restores the user's intended lateness bound relative to REAL
  * event time. An event older than `lateness` loses only its
  * already-finalized cells — its still-open cells are above the
  * watermark and still count (the standard per-row late rule).
  *
  * State is one row of four longs per OPEN cell — bounded by
  * (lateness + longWindow)/step cells, independent of event volume.
  * Cells that saw no contribution at all emit nothing (a streaming
  * sink cannot gap-fill the past); the batch twin's zero rows are the
  * backfill path.
  */
object SloStream {

  /** Per-finalized-step burn rates + `firing`, append mode. Column
    * names match [[graft.analysis.Slo.multiWindowAlert]] so results are
    * directly comparable. `stream` must NOT be pre-watermarked: the
    * watermark is applied here, on the synthetic step time. */
  def multiWindowAlert(stream: DataFrame, tsCol: String, isError: Column,
      stepSeconds: Long, shortWindow: Long, longWindow: Long,
      errorBudget: Double, threshold: Double,
      latenessSeconds: Long = 0L): DataFrame = {
    graft.analysis.Slo.validateWindows(stepSeconds,
      Seq(shortWindow, longWindow))
    require(shortWindow < longWindow,
      s"shortWindow ($shortWindow) must be strictly shorter than " +
        s"longWindow ($longWindow)")
    val delay = latenessSeconds + longWindow - stepSeconds
    // bucketing + membership fan-out shared with the batch twin
    // (Slo.stepBucket / Slo.memberSteps) so the two stay comparable
    val contrib = stream
      .select(graft.analysis.Slo.stepBucket(tsCol, stepSeconds)
        .as("__b"),
        when(isError, 1L).otherwise(0L).as("__e"))
      .withColumn("__w",
        explode(array(lit(shortWindow), lit(longWindow))))
      .withColumn("__s", graft.analysis.Slo.memberSteps(col("__b"),
        col("__w"), stepSeconds))
      .withColumn("__step_ts", timestamp_seconds(col("__s")))
      .withWatermark("__step_ts", s"$delay seconds")
    def fam(w: Long, err: Boolean): Column = {
      val base = when(col("__w") === w,
        if (err) col("__e") else lit(1L)).otherwise(0L)
      sum(base).as(s"${if (err) "err" else "total"}_${w}s")
    }
    val agg = contrib
      .groupBy(window(col("__step_ts"), s"$stepSeconds seconds").as("__c"))
      .agg(fam(shortWindow, err = false), fam(shortWindow, err = true),
        fam(longWindow, err = false), fam(longWindow, err = true))
    def burn(w: Long): Column =
      when(col(s"total_${w}s") > 0,
        (col(s"err_${w}s").cast("double") / col(s"total_${w}s")) /
          errorBudget).as(s"burn_${w}s")
    agg
      .select(unix_timestamp(col("__c.start")).as("bucket"),
        col(s"total_${shortWindow}s"), col(s"err_${shortWindow}s"),
        burn(shortWindow),
        col(s"total_${longWindow}s"), col(s"err_${longWindow}s"),
        burn(longWindow))
      .withColumn("firing",
        when(col(s"burn_${shortWindow}s") > threshold &&
          col(s"burn_${longWindow}s") > threshold, 1L).otherwise(0L))
  }
}
