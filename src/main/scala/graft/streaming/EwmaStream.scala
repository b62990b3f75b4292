package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous EWMA control chart — the streaming twin of
  * [[graft.analysis.ChangePoint.ewmaChart]], and the genuinely hard
  * streaming shape: the EWMA recursion is ORDER-SENSITIVE per series,
  * but a stream delivers buckets out of order within the lateness
  * bound. A windowed aggregation can't express "fold buckets in event
  * order", so this is the engine's one
  * `flatMapGroupsWithState` operator: per series, arriving values
  * aggregate into an in-state per-bucket buffer (map bucket → sum),
  * and every trigger FINALIZES the prefix of buckets the watermark
  * has passed — folding them through the recursion in bucket order,
  * emitting one control-chart row each, and carrying (z, t) forward.
  * An event-time timeout re-arms on the oldest open bucket so quiet
  * series still finalize when the watermark advances past them.
  *
  * State per series = the open-bucket map (bounded by
  * lateness/step + 1 cells — finalized buckets leave state
  * immediately) plus two doubles; independent of event volume.
  *
  * `target` and `sigma` are REQUIRED (the batch twin's pinned mode):
  * a stream can't self-calibrate a mean it hasn't seen, and pinning
  * makes stream and batch outputs directly comparable — the spec
  * asserts row-for-row parity with [[graft.analysis.ChangePoint
  * .ewmaChart]] over the same finalized buckets. Like the batch twin,
  * only OBSERVED buckets emit (a streaming sink can't gap-fill the
  * past); the warm-up band uses t = points folded so far. */
object EwmaStream {

  /** Per-series state: open-bucket sums + the carried (z, t). Public
    * only because the state ENCODER is code-generated — a private
    * case class breaks the generated accessor calls. */
  final case class EwmaState(buf: Map[Long, Double], z: Double,
      t: Long)

  final case class ChartRow(key: String, bucket: java.sql.Timestamp,
      x: Double, z: Double, ucl: Double, lcl: Double, alarm: Long)

  /** Append-mode chart rows for finalized buckets. `x` per bucket is
    * the SUM of arriving values (pre-aggregate upstream for other
    * reductions). */
  def chart(stream: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, stepSeconds: Long, lambda: Double,
      width: Double, target: Double, sigma: Double,
      latenessSeconds: Long = 0L): Dataset[ChartRow] = {
    require(stepSeconds > 0, "step must be positive")
    require(lambda > 0.0 && lambda <= 1.0, "lambda must be in (0, 1]")
    require(width > 0.0 && sigma > 0.0, "width and sigma must be > 0")
    val spark = stream.sparkSession
    import spark.implicits._
    val rows = stream
      .withWatermark(tsCol, s"$latenessSeconds seconds")
      .select(col(keyCol).cast("string").as("k"),
        (floor(unix_timestamp(col(tsCol)) / stepSeconds) * stepSeconds)
          .cast("long").as("b"),
        col(valueCol).cast("double").as("x"),
        col(tsCol).as("ts"))
      .as[(String, Long, Double, java.sql.Timestamp)]

    def halfWidth(t: Long): Double =
      width * sigma * math.sqrt(lambda / (2.0 - lambda) *
        (1.0 - math.pow(1.0 - lambda, 2.0 * t)))

    def fold(key: String, it: Iterator[(String, Long, Double,
        java.sql.Timestamp)], state: GroupState[EwmaState])
        : Iterator[ChartRow] = {
      val prev = state.getOption.getOrElse(
        EwmaState(Map.empty, target, 0L))
      var buf = prev.buf
      it.foreach { case (_, b, x, _) =>
        buf = buf.updated(b, buf.getOrElse(b, 0.0) + x)
      }
      // finalize every bucket the watermark has fully passed; the
      // watermark is in millis of event time
      val wmSec = state.getCurrentWatermarkMs() / 1000L
      val (done, open) = buf.partition { case (b, _) =>
        b + stepSeconds <= wmSec }
      var z = prev.z
      var t = prev.t
      val out = done.toSeq.sortBy(_._1).map { case (b, x) =>
        z = lambda * x + (1.0 - lambda) * z
        t += 1
        val hw = halfWidth(t)
        val (ucl, lcl) = (target + hw, target - hw)
        ChartRow(key, new java.sql.Timestamp(b * 1000L), x, z, ucl,
          lcl, if (z > ucl || z < lcl) 1L else 0L)
      }
      state.update(EwmaState(open, z, t))
      // re-arm on the oldest open bucket so a quiet series finalizes
      // when the watermark moves, even with no further events
      open.keys.minOption.foreach(b =>
        state.setTimeoutTimestamp((b + stepSeconds) * 1000L))
      out.iterator
    }

    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fold)
  }
}
