package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming tail-based trace sampling — the continuous twin of
  * [[graft.analysis.TailSampling]], and the shape the OTel collector's
  * tailsamplingprocessor actually runs: spans buffer per trace until the
  * DECISION POINT — `decisionWaitSeconds` of event time after the
  * trace's first-seen span — then the whole buffer is evaluated against
  * the policy chain (error / latency / deterministic-hash prob, same
  * precedence and same portable md5 uniform as the batch operator) and
  * either flushed with its reason or discarded.
  *
  * Straggler spans arriving after the decision follow the OTel
  * contract WITHIN the watermark horizon: a span whose event time is
  * still ahead of the watermark but whose trace has already decided is
  * routed by the verdict — kept traces forward it with their reason,
  * dropped traces keep dropping it, and the decision never flips while
  * the verdict is retained. Two documented limits: (1) spans with event
  * time BEHIND the watermark never reach the operator at all — Spark's
  * stateful-op watermark filter drops them first, the standard
  * dropped-late contract of every watermarked stage here; (2) the
  * verdict tombstone is forgotten after `retentionSeconds` of
  * event-time inactivity (bounded total state — the collector's
  * num_traces LRU expresses the same tradeoff), after which a returning
  * straggler is treated as a NEW trace and re-decided from scratch;
  * size retentionSeconds to the span-arrival tail you need to honor.
  *
  * State per trace: the pending span buffer until decision (bounded by
  * decisionWait × span rate — the same bound the collector's
  * num_traces×expected-spans memory budget expresses), then the
  * constant-size verdict tombstone until retention expiry. Every
  * decision is event-time-driven (EventTimeTimeout), so a trace whose
  * spans simply stop still decides when the watermark passes its
  * decision point.
  *
  * Null tolerance matches the batch operator: a null error flag counts
  * as false, a null latency never clears the threshold, and rows with a
  * null event time are dropped before the shuffle (a watermarked stage
  * cannot place them). */
object TailSampleStream {

  final case class SpanIn(trace: String, ts: Timestamp, err: Boolean,
      lat: Double, payload: String)
  final case class SampledSpan(trace: String, ts: Timestamp,
      payload: String, reason: String)
  /** decided: 0 = buffering, 1 = kept, -1 = dropped. Parallel Seqs for
    * the pending buffer (flat state encoder, the FunnelStream idiom). */
  final case class TraceState(pendingMs: Seq[Long], pendingErr: Seq[Boolean],
      pendingLat: Seq[Double], pendingPayload: Seq[String],
      firstMs: Long, decided: Int, reason: String, lastSeenMs: Long)

  /** First 8 md5 hex chars of the trace id as a uniform in [0,1) — the
    * same value Curation.hashUniform computes as a Column, so the batch
    * and streaming samplers keep identical trace sets. */
  private[streaming] def hashUniform(trace: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(trace.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v.toDouble / 4294967296.0
  }

  /** `stream` must carry an event-time watermark on `tsCol`. Columns:
    * trace id (any castable type), event-time, a boolean error flag, a
    * numeric latency, and an opaque payload string (pack with
    * `to_json(struct(...))` upstream). */
  def sample(stream: DataFrame, traceCol: String, tsCol: String,
      errCol: String, latCol: String, payloadCol: String,
      decisionWaitSeconds: Long, latencyThreshold: Double,
      keepFraction: Double,
      retentionSeconds: Long = 3600L): Dataset[SampledSpan] = {
    require(decisionWaitSeconds > 0, "decisionWaitSeconds must be positive")
    require(keepFraction >= 0 && keepFraction <= 1,
      s"keepFraction must be in [0,1], got $keepFraction")
    require(retentionSeconds >= 0, "retentionSeconds must be non-negative")
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    stream
      .filter(col(tsCol).isNotNull)
      .select(col(traceCol).cast("string").as("trace"),
        col(tsCol).as("ts"),
        coalesce(col(errCol).cast("boolean"), lit(false)).as("err"),
        // null latency must never clear the threshold (batch max()
        // ignores nulls the same way); -Inf into a primitive field
        coalesce(col(latCol).cast("double"),
          lit(Double.NegativeInfinity)).as("lat"),
        col(payloadCol).cast("string").as("payload"))
      .as[SpanIn]
      .groupByKey(_.trace)
      .flatMapGroupsWithState[TraceState, SampledSpan](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (trace: String, rows: Iterator[SpanIn],
            state: GroupState[TraceState]) =>
          val wm = state.getCurrentWatermarkMs()
          val evs = rows.toSeq
          val st = state.getOption.getOrElse(
            TraceState(Nil, Nil, Nil, Nil, Long.MinValue, 0, "",
              Long.MinValue))
          val lastSeen = (st.lastSeenMs +: evs.map(_.ts.getTime)).max
          if (st.decided != 0) {
            // verdict tombstone: route late spans, expire on inactivity
            val out =
              if (st.decided == 1)
                evs.iterator.map(e =>
                  SampledSpan(trace, e.ts, e.payload, st.reason))
              else Iterator.empty
            val expiry = lastSeen + retentionSeconds * 1000L
            if (expiry <= wm) state.remove()
            else {
              state.update(st.copy(lastSeenMs = lastSeen))
              state.setTimeoutTimestamp(expiry)
            }
            out
          } else {
            // MinValue is the no-spans-yet sentinel — min() over it
            // would pin the decision point to the distant past
            val firstMs = (evs.map(_.ts.getTime) ++
              Some(st.firstMs).filter(_ != Long.MinValue)).min
            val pMs = st.pendingMs ++ evs.map(_.ts.getTime)
            val pErr = st.pendingErr ++ evs.map(_.err)
            val pLat = st.pendingLat ++ evs.map(_.lat)
            val pPay = st.pendingPayload ++ evs.map(_.payload)
            val decideAt = firstMs + decisionWaitSeconds * 1000L
            if (wm >= decideAt) {
              // decision point passed: evaluate the policy chain over
              // the complete buffer (OTel precedence), flush or drop
              val reason =
                if (pErr.contains(true)) "error"
                else if (pLat.nonEmpty && pLat.max >= latencyThreshold)
                  "latency"
                else if (hashUniform(trace) < keepFraction) "prob"
                else null
              val decided = if (reason == null) -1 else 1
              val expiry = lastSeen + retentionSeconds * 1000L
              if (expiry <= wm)
                // the retention window already elapsed in event time —
                // no tombstone to keep (setTimeoutTimestamp would
                // throw on a timestamp behind the watermark)
                state.remove()
              else {
                state.update(TraceState(Nil, Nil, Nil, Nil, firstMs,
                  decided, if (reason == null) "" else reason, lastSeen))
                state.setTimeoutTimestamp(expiry)
              }
              if (decided == 1)
                pMs.indices.iterator.map(i => SampledSpan(trace,
                  new Timestamp(pMs(i)), pPay(i), reason))
              else Iterator.empty
            } else {
              state.update(TraceState(pMs, pErr, pLat, pPay, firstMs, 0,
                "", lastSeen))
              // wake exactly at the decision point (> wm by the branch)
              state.setTimeoutTimestamp(decideAt)
              Iterator.empty
            }
          }
      }
  }
}
