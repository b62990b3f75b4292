package graft.compile

import java.time.Instant

import graft.ir.{DateRange, OrderBy}

/** Progressive search-window schedule — the reference splits a large search
  * range into escalating windows (15 m, 6 h, 6 h, 12 h, then 24 h
  * repeating) and pages them newest-first unless the first ORDER BY is the
  * timestamp ascending
  * (packages/app/src/utils/searchWindows.ts:1-60; direction rule
  * packages/common-utils/src/core/utils.ts:925-965). With Spark the windows
  * are an execution-strategy detail (one job can scan the lot), but the
  * schedule matters for interactive search: early windows return quickly.
  */
object SearchWindows {

  /** The reference ladder in seconds: 15m, 6h, 6h, 12h, then 24h repeats. */
  val LadderSeconds: Seq[Long] =
    Seq(15 * 60L, 6 * 3600L, 6 * 3600L, 12 * 3600L)
  val RepeatSeconds: Long = 24 * 3600L

  /** Ascending iff the first ORDER BY is the timestamp column ascending
    * (utils.ts:946). */
  def isAscending(orderBy: Seq[OrderBy], tsColumn: String): Boolean =
    orderBy.headOption.exists(o => o.expression == tsColumn && !o.desc)

  /** Split `range` into progressive windows. Descending (default): newest
    * window first, sized by the ladder walking back from `to`. Ascending:
    * oldest first, walking forward from `from`. */
  def windows(range: DateRange, ascending: Boolean = false)
      : Seq[DateRange] = {
    val sizes = LadderSeconds.iterator ++ Iterator.continually(RepeatSeconds)
    val out = Seq.newBuilder[DateRange]
    if (ascending) {
      var cur = range.from
      while (cur.isBefore(range.to)) {
        val size = sizes.next()
        val end = Seq(cur.plusSeconds(size), range.to)
          .minBy(_.toEpochMilli)
        out += DateRange(cur, end, inclusiveEnd = end == range.to)
        cur = end
      }
    } else {
      var cur = range.to
      var first = true
      while (cur.isAfter(range.from)) {
        val size = sizes.next()
        val start = Seq(cur.minusSeconds(size), range.from)
          .maxBy(_.toEpochMilli)
        out += DateRange(start, cur, inclusiveEnd = first)
        first = false
        cur = start
      }
    }
    out.result()
  }
}
