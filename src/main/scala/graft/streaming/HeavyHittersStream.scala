package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming SpaceSaving heavy hitters — the streaming twin of the
  * batch TopK/frequent-items pass (q84): per tumbling window, track
  * the `capacity` heaviest keys with the Metwally et al. 2005
  * SpaceSaving summary. An exact windowed groupBy-count would carry
  * state proportional to the window's DISTINCT keys — unbounded on a
  * high-cardinality stream (user ids, URLs); SpaceSaving pins state
  * to `capacity` counters per window with the classic guarantees:
  * every true count n_i > N/capacity is present, and each reported
  * count overestimates by at most its recorded `err`.
  *
  * Shape: one `flatMapGroupsWithState` keyed by WINDOW START — counts
  * fold into the in-state summary as batches arrive, and the window
  * EMITS (top `k` by count, ties broken by key) when the event-time
  * timeout fires after the watermark passes the window end. State per
  * window = `capacity` (key, count, err) triples, independent of
  * volume and cardinality.
  *
  * When the window's distinct-key count never exceeds `capacity`, the
  * summary IS the exact count table (err = 0 for every key) — the
  * property the parity spec pins against a batch groupBy-count. */
object HeavyHittersStream {

  /** Per-window state: parallel key/count/err vectors (encoder-simple;
    * capacity-bounded so linear scans are fine). Public because the
    * state encoder is code-generated. */
  final case class SsState(keys: List[String], counts: List[Long],
      errs: List[Long], windowEnd: Long)

  final case class HitterRow(window_start: java.sql.Timestamp,
    key: String, cnt: Long, err: Long, rank: Int)

  /** Append-mode rows: per closed window, the top `k` summary entries
    * ordered by (count desc, key). Null stream keys count under the
    * "__null" sentinel (dropping them would silently shrink N). */
  def topK(stream: DataFrame, tsCol: String, keyCol: String,
      windowSeconds: Long, capacity: Int, k: Int,
      latenessSeconds: Long = 0L): Dataset[HitterRow] = {
    require(windowSeconds > 0, "window must be positive")
    require(capacity > 0 && k > 0, "capacity and k must be positive")
    require(k <= capacity, "k cannot exceed the summary capacity")
    val spark = stream.sparkSession
    import spark.implicits._
    // the ts column rides along so the watermark survives the
    // projection into flatMapGroupsWithState (the EwmaStream shape)
    val rows = stream
      .withWatermark(tsCol, s"$latenessSeconds seconds")
      .select(
        (floor(unix_timestamp(col(tsCol)) / windowSeconds) *
          windowSeconds).cast("long").as("w"),
        coalesce(col(keyCol).cast("string"), lit("__null")).as("k"),
        col(tsCol).as("ts"))
      .as[(Long, String, java.sql.Timestamp)]

    def feed(st: SsState, key: String): SsState = {
      val i = st.keys.indexOf(key)
      if (i >= 0)
        st.copy(counts = st.counts.updated(i, st.counts(i) + 1L))
      else if (st.keys.length < capacity)
        st.copy(keys = st.keys :+ key, counts = st.counts :+ 1L,
          errs = st.errs :+ 0L)
      else {
        // evict the minimum-count entry (ties: largest key, so the
        // kept set is deterministic for the spec); the newcomer
        // inherits its count as the overestimate bound
        var mi = 0
        var idx = 0
        while (idx < st.keys.length) {
          if (st.counts(idx) < st.counts(mi) ||
              (st.counts(idx) == st.counts(mi) &&
                st.keys(idx) > st.keys(mi))) mi = idx
          idx += 1
        }
        val base = st.counts(mi)
        st.copy(keys = st.keys.updated(mi, key),
          counts = st.counts.updated(mi, base + 1L),
          errs = st.errs.updated(mi, base))
      }
    }

    def close(w: Long, st: SsState): Iterator[HitterRow] =
      st.keys.indices
        .sortBy(i => (-st.counts(i), st.keys(i)))
        .take(k).zipWithIndex
        .map { case (i, r) =>
          HitterRow(new java.sql.Timestamp(w * 1000L), st.keys(i),
            st.counts(i), st.errs(i), r + 1)
        }.iterator

    rows.groupByKey(_._1)
      .flatMapGroupsWithState[SsState, HitterRow](OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        case (w, it, state: GroupState[SsState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            close(w, st)
          } else {
            var st = state.getOption.getOrElse(
              SsState(Nil, Nil, Nil, (w + windowSeconds) * 1000L))
            it.foreach { case (_, key, _) => st = feed(st, key) }
            state.update(st)
            // fire once the watermark passes the window end
            state.setTimeoutTimestamp(st.windowEnd)
            Iterator.empty
          }
      }
  }
}
