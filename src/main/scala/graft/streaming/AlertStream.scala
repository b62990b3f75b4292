package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.analysis.Alerts

/** Streaming alert evaluation — the push-based upgrade of the reference's
  * poll-every-minute check-alerts task (packages/api/src/tasks/checkAlerts):
  * instead of re-querying closed windows on a schedule, the per-window
  * values stream through a keyed state machine
  * (`flatMapGroupsWithState`) that tracks the consecutive-exceed count per
  * alert and emits only STATE TRANSITIONS (OK→ALERT, ALERT→OK) — exactly
  * the reference's numConsecutiveWindows semantics, evaluated incrementally
  * with exactly-once state instead of a Mongo-backed history lookback.
  *
  * Input: one row per (alert id, closed window, value) — e.g. a
  * `Streaming.rollup` keyed by the alert's group. At 100 TB the state is
  * O(#alerts) longs, trivially partitioned by alert id.
  */
object AlertStream {

  final case class AlertSpec(
      tpe: Alerts.ThresholdType,
      threshold: Double,
      thresholdMax: Option[Double] = None,
      numConsecutive: Int = 1)

  final case class WindowValue(alert_id: String, window_start: Timestamp,
      value: Double)
  final case class Transition(alert_id: String, window_start: Timestamp,
      state: String, value: Double)
  /** Keyed state: consecutive exceed count + last emitted state + the last
    * processed window start (epoch millis), so late windows arriving in a
    * later micro-batch can't corrupt the consecutive counter.
    *
    * STATE SCHEMA v2: `lastWindowMillis` was added after the initial
    * release — the flatMapGroupsWithState state encoder derives from this
    * case class, so a streaming checkpoint written by the 2-field v1 state
    * cannot be restored by this build (Spark fails the state-store schema
    * check). Restart such a query from a fresh checkpoint; the input
    * contract (closed, append-mode windows) makes a replay idempotent for
    * the emitted transitions. */
  final case class RunState(consecutive: Int, state: String,
      lastWindowMillis: Long = Long.MinValue)

  /** Evaluate a stream (or batch frame) of window values into state
    * transitions. `configs` maps alert id → threshold spec; rows for
    * unknown alert ids are ignored. Windows are sorted within each
    * micro-batch; a window at-or-before the last processed one (a late
    * arrival from an earlier batch, or an update-mode REVISION of an
    * already-counted window) is DROPPED — the counter only ever advances
    * forward in window time. Feed this operator CLOSED windows (append
    * mode / watermark-finalized rollups): a source that re-emits revised
    * values for the same window start would need per-window revert logic,
    * which this state machine intentionally does not carry. */
  def transitions(windowValues: DataFrame,
      configs: Map[String, AlertSpec]): Dataset[Transition] = {
    val spark = windowValues.sparkSession
    import spark.implicits._
    windowValues
      .selectExpr("alert_id", "window_start", "value")
      .as[WindowValue]
      .groupByKey(_.alert_id)
      .flatMapGroupsWithState[RunState, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[WindowValue],
            state: GroupState[RunState]) =>
          configs.get(id) match {
            case None => Iterator.empty
            case Some(cfg) =>
              var st = state.getOption.getOrElse(RunState(0, "OK"))
              // windows may arrive unordered within a micro-batch (sort),
              // and late windows from PREVIOUS batches are dropped — they
              // already missed their turn in the consecutive counter
              val out = rows.toSeq.sortBy(_.window_start.getTime)
                .flatMap { r =>
                  val wMillis = r.window_start.getTime
                  if (wMillis <= st.lastWindowMillis) None
                  else {
                    val exceeded = Alerts.doesExceedThreshold(
                      cfg.tpe, cfg.threshold, cfg.thresholdMax, r.value)
                    val consec = if (exceeded) st.consecutive + 1 else 0
                    val next =
                      if (consec >= cfg.numConsecutive) "ALERT" else "OK"
                    val fired = next != st.state
                    st = RunState(consec, next, wMillis)
                    if (fired)
                      Some(Transition(id, r.window_start, next, r.value))
                    else None
                  }
                }
              state.update(st)
              out.iterator
          }
      }
  }
}
