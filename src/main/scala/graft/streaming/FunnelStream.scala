package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming windowFunnel — the continuous twin of
  * [[graft.analysis.Funnel]]: per key, emit a row each time the key's
  * deepest completed funnel level DEEPENS (append-mode, monotone per
  * key), evaluated with exactly the batch greedy recurrence.
  *
  * Event-time correctness: the greedy scan is only exact over
  * time-ORDERED events, and a stream delivers them unordered. Incoming
  * step events therefore buffer in keyed state until the watermark
  * passes their event time; each micro-batch folds the newly-finalized
  * prefix (sorted) through the recurrence and keeps the rest pending.
  * The result after any batch equals the batch Funnel over all
  * finalized events — late data inside the watermark horizon lands in
  * its correct order position, and data later than the watermark is the
  * source's dropped-late contract, same as every watermarked aggregation
  * here.
  *
  * State PER KEY is bounded: k chain-start doubles + the pending buffer,
  * which holds only step events inside the watermark horizon (the
  * non-step corpus is filtered before the shuffle) — O(horizon ×
  * per-key step rate). Total state is O(tracked keys): monotone
  * per-key emission inherently needs a per-key high-water mark. Two
  * reliefs: a fully-converted key shrinks to a constant marker (its
  * buffers clear, folding stops), and `idleTimeoutSeconds` — when set —
  * REMOVES keys whose last activity is that far behind the watermark,
  * trading exactness for bounded total state: a removed key that
  * returns re-reports its levels from scratch (lower-level re-emissions
  * a consumer must tolerate). Unset, key state lives for the stream's
  * lifetime, like any per-key monotone tracker. */
object FunnelStream {

  final case class StepEvent(key: String, ts: Timestamp, lvl: Int)
  final case class LevelUpdate(key: String, level: Int, at: Timestamp)
  /** pendingTs/pendingLvl parallel arrays (Spark derives a clean state
    * encoder for flat Seq fields); best = greedy chain starts, seconds;
    * doneMs = the fold frontier (watermark at the last fold) — events at
    * or before it arriving now are post-watermark stragglers and are
    * DROPPED rather than folded out of order, keeping the recurrence
    * exact over everything it has consumed. */
  final case class FunnelState(pendingTs: Seq[Long], pendingLvl: Seq[Int],
      best: Seq[Double], emitted: Int, doneMs: Long = Long.MinValue,
      lastSeenMs: Long = Long.MinValue)

  private val NegInf = -1e300

  /** `stream` must carry an event-time watermark on `tsCol` (set
    * `withWatermark` upstream); rows whose `stepCol` is not in `steps`
    * are discarded before the state shuffle. */
  def levelUpdates(stream: DataFrame, keyCol: String, tsCol: String,
      stepCol: String, steps: Seq[String], windowSeconds: Double,
      idleTimeoutSeconds: Option[Long] = None)
      : Dataset[LevelUpdate] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must differ")
    require(idleTimeoutSeconds.forall(_ >= windowSeconds),
      "idleTimeoutSeconds must be at least windowSeconds: a shorter TTL " +
        "would reset chains the funnel window still allows to extend")
    val k = steps.size
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lvl = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(stepCol) === s, i).otherwise(acc)
      }
    stream
      .withColumn("__lvl", lvl)
      .filter(col("__lvl") >= 0)
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).as("ts"), col("__lvl").as("lvl"))
      .as[StepEvent]
      .groupByKey(_.key)
      // EventTimeTimeout, not NoTimeout: a key's buffered events must
      // fold when the WATERMARK finalizes them, even if the key never
      // receives another event — the timeout (set to the earliest
      // pending event) wakes the key as the watermark passes it.
      .flatMapGroupsWithState[FunnelState, LevelUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[StepEvent],
            state: GroupState[FunnelState]) =>
          val wm = state.getCurrentWatermarkMs()
          val blank = FunnelState(Nil, Nil, Seq.fill(k)(NegInf), 0)
          // materialized per key per batch — bounded by the batch
          val evs = rows.map(e => (e.ts.getTime, e.lvl)).toSeq
          // a dormant key is logically expired when (a) the watermark
          // passed its TTL, or (b) its OWN event stream has a gap of at
          // least the TTL (the returning event arrives while the
          // watermark still lags the expiry — event-time dormancy, not
          // wake-schedule luck). Reset BEFORE folding; safe because
          // ttl ≥ window means no chain can span the gap anyway.
          val st = state.getOption match {
            case Some(s) if idleTimeoutSeconds.exists { ttl =>
              val expiry = s.lastSeenMs + ttl * 1000L
              s.pendingTs.isEmpty && s.lastSeenMs != Long.MinValue &&
                (expiry <= wm ||
                  (evs.nonEmpty && evs.map(_._1).min >= expiry))
            } => blank
            case Some(s) => s
            case None => blank
          }
          val converted = st.emitted >= k
          val lastSeen =
            if (evs.isEmpty) st.lastSeenMs
            else math.max(st.lastSeenMs, evs.map(_._1).max)
          val fresh =
            if (converted) Nil // nothing can deepen — skip folding
            else evs.filter(_._1 > st.doneMs)
          val all = (st.pendingTs.zip(st.pendingLvl) ++ fresh).sorted
          val (ready, pending) = all.partition(_._1 <= wm)
          val best = st.best.toArray
          for ((ms, l) <- ready) {
            val t = ms / 1000.0
            if (l == 0) best(0) = math.max(best(0), t)
            else if (best(l - 1) > NegInf &&
              t - best(l - 1) <= windowSeconds)
              best(l) = math.max(best(l), best(l - 1))
          }
          val level = best.lastIndexWhere(_ > NegInf) + 1
          val out =
            if (level > st.emitted && ready.nonEmpty)
              Iterator.single(LevelUpdate(key, level,
                new Timestamp(ready.last._1)))
            else Iterator.empty
          val emitted = math.max(level, st.emitted)
          if (emitted >= k)
            // fully converted: shrink to the constant marker — buffers
            // gone, future invocations fast-path out
            state.update(FunnelState(Nil, Nil, Nil, emitted, wm, lastSeen))
          else
            state.update(FunnelState(pending.map(_._1),
              pending.map(_._2), best.toSeq, emitted, wm, lastSeen))
          if (pending.nonEmpty)
            // wake when the watermark passes the earliest pending event
            // (pending > wm by construction, so the call is legal)
            state.setTimeoutTimestamp(pending.map(_._1).min)
          else idleTimeoutSeconds.foreach { ttl =>
            // idle expiry keys off the key's last EVENT, not the
            // advancing watermark — a dead key must not re-arm itself
            val expiry = lastSeen + ttl * 1000L
            if (expiry <= wm) state.remove()
            else state.setTimeoutTimestamp(expiry)
          }
          out
      }
  }
}
