package graft.analysis

import java.time.Instant

/** Threshold alert evaluator — the pure window/threshold logic of the
  * reference's check-alerts task
  * (packages/api/src/tasks/checkAlerts/index.ts:232-348, 1561-1600).
  * The engine side is just a ChartConfig count-per-bucket query; this
  * evaluates its result series.
  */
object Alerts {

  sealed trait ThresholdType
  object ThresholdType {
    case object Above extends ThresholdType // value >= t
    case object Below extends ThresholdType // value < t
    case object AboveExclusive extends ThresholdType // value > t
    case object BelowOrEqual extends ThresholdType // value <= t
    case object Equal extends ThresholdType
    case object NotEqual extends ThresholdType
    case object Between extends ThresholdType // [t, tMax]
    case object NotBetween extends ThresholdType
  }

  /** Exactly the reference's doesExceedThreshold (:232-264). */
  def doesExceedThreshold(tpe: ThresholdType, threshold: Double,
      thresholdMax: Option[Double], value: Double): Boolean = {
    import ThresholdType._
    tpe match {
      case Above => value >= threshold
      case Below => value < threshold
      case AboveExclusive => value > threshold
      case BelowOrEqual => value <= threshold
      case Equal => value == threshold
      case NotEqual => value != threshold
      case Between | NotBetween =>
        val max = thresholdMax.getOrElse(throw new IllegalArgumentException(
          s"thresholdMax is required for threshold type $tpe"))
        if (tpe == Between) value >= threshold && value <= max
        else value < threshold || value > max
    }
  }

  /** Offset normalization (:268-293): null/∞ → 0; ≥ window → mod window. */
  def normalizeScheduleOffsetMinutes(offset: Option[Int],
      windowMins: Int): Int = offset match {
    case None => 0
    case Some(o) =>
      val n = math.max(0, o)
      if (n < windowMins) n else n % windowMins
  }

  /** Scheduled window start (:326-348): anchored to scheduleStartAt when
    * set (whole windows since start), else round down to the window
    * boundary shifted by the offset. */
  def getScheduledWindowStart(now: Instant, windowMins: Int,
      scheduleOffsetMinutes: Int = 0,
      scheduleStartAt: Option[Instant] = None): Instant = {
    val windowMs = windowMins * 60000L
    scheduleStartAt match {
      case Some(start) =>
        val elapsed = math.max(0L, now.toEpochMilli - start.toEpochMilli)
        val windows = elapsed / windowMs
        Instant.ofEpochMilli(start.toEpochMilli + windows * windowMs)
      case None =>
        if (scheduleOffsetMinutes <= 0)
          Instant.ofEpochMilli(now.toEpochMilli / windowMs * windowMs)
        else {
          val shifted = now.toEpochMilli - scheduleOffsetMinutes * 60000L
          val rounded = shifted / windowMs * windowMs
          Instant.ofEpochMilli(rounded + scheduleOffsetMinutes * 60000L)
        }
    }
  }

  sealed trait AlertState
  case object OK extends AlertState
  case object ALERT extends AlertState

  /** Consecutive-window evaluation (reference numConsecutiveWindows
    * lookback, :1110,1561-1600): fire only when the threshold is exceeded
    * in `numConsecutive` consecutive closed windows. `series` maps window
    * start → value (missing windows count as 0). */
  def evaluate(series: Map[Instant, Double], windowStarts: Seq[Instant],
      tpe: ThresholdType, threshold: Double,
      thresholdMax: Option[Double] = None,
      numConsecutive: Int = 1): AlertState = {
    val exceeded = windowStarts.map(w =>
      doesExceedThreshold(tpe, threshold, thresholdMax,
        series.getOrElse(w, 0.0)))
    if (exceeded.size >= numConsecutive &&
      exceeded.takeRight(numConsecutive).forall(identity)) ALERT
    else OK
  }

  /** The reference's fixed interval set (types.ts:627-649). */
  val IntervalMinutes: Map[String, Int] = Map(
    "1m" -> 1, "5m" -> 5, "15m" -> 15, "30m" -> 30,
    "1h" -> 60, "6h" -> 360, "12h" -> 720, "1d" -> 1440)
}
