package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tail-based trace sampling — the OpenTelemetry collector's
  * tailsamplingprocessor decision model, as a batch operator: decide
  * per COMPLETE trace (never per span, so a kept trace keeps every
  * span), with the three canonical policies in priority order:
  *
  *  1. `error`  — any span in the trace matched the error predicate;
  *  2. `latency` — the trace-level latency aggregate cleared a
  *     threshold;
  *  3. `prob`   — deterministic hash sampling on the trace id (the
  *     engine-portable md5 uniform of Curation.hashUniform, so a retry
  *     or an independent engine keeps the SAME traces — no RNG state).
  *
  * Scale shape: one hash shuffle of (trace, flags) with map-side
  * combine builds the traces-sized verdict frame; kept-trace spans
  * come back via one equi-join on the trace key (both sides hash on
  * it — co-partitioned, broadcastable when the kept set is small).
  * Nothing is ever corpus × corpus and no driver collect exists. */
object TailSampling {

  /** (trace, reason) for kept traces only: reason ∈ error | latency |
    * prob, first matching policy wins (the OTel precedence). `error` is
    * a per-span boolean, `latency` a per-span numeric aggregated with
    * max (span duration → trace critical duration proxy). */
  def verdicts(spans: DataFrame, traceCol: String, error: Column,
      latency: Column, latencyThreshold: Double,
      keepFraction: Double): DataFrame = {
    require(keepFraction >= 0 && keepFraction <= 1,
      s"keepFraction must be in [0,1], got $keepFraction")
    val u = graft.pipeline.Curation.hashUniform(col(traceCol))
    spans
      .groupBy(col(traceCol))
      .agg(max(when(error, 1).otherwise(0)).as("__err"),
        max(latency).as("__lat"))
      .withColumn("reason",
        when(col("__err") === 1, "error")
          .when(col("__lat") >= latencyThreshold, "latency")
          .when(u < keepFraction, "prob"))
      .filter(col("reason").isNotNull)
      .select(col(traceCol), col("reason"))
  }

  /** Every span of every kept trace, plus its trace's `reason` column —
    * the sampled stream an exporter would ship. */
  def sample(spans: DataFrame, traceCol: String, error: Column,
      latency: Column, latencyThreshold: Double,
      keepFraction: Double): DataFrame =
    spans.join(
      verdicts(spans, traceCol, error, latency, latencyThreshold,
        keepFraction),
      Seq(traceCol))
}
