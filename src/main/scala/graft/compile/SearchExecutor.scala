package graft.compile

import org.apache.spark.sql.DataFrame

import graft.ir._

/** Progressive search execution — the engine-side equivalent of the
  * reference's `useOffsetPaginatedQuery`
  * (packages/app/src/hooks/useOffsetPaginatedQuery.tsx:56-135): a search
  * over a large date range runs as a sequence of ladder windows (newest
  * first unless the first ORDER BY is the timestamp ascending), each window
  * paged with its own offset until it is exhausted, stopping as soon as
  * `limit` rows are accumulated — so an interactive "latest 100 events"
  * search touches only the most recent 15-minute window.
  *
  * In Spark each window is a separate partition-pruned job; the early
  * windows return quickly and later windows never run when the limit is
  * already met.
  */
object SearchExecutor {

  final case class Page(rows: Array[org.apache.spark.sql.Row],
      windowsScanned: Int)

  /** Run `q` (must have a dateRange and a limit) progressively. */
  def paginate(q: Query, catalog: Catalog,
      opts: QueryCompiler.Options = QueryCompiler.Options()): Page = {
    val range = q.dateRange.getOrElse(throw new IllegalArgumentException(
      "progressive search requires a dateRange"))
    val limit = q.limit.getOrElse(throw new IllegalArgumentException(
      "progressive search requires a limit"))
    val tsCol = catalog(q.from).timestampColumn.getOrElse(
      throw new IllegalArgumentException("source has no timestamp column"))
    val ascending = SearchWindows.isAscending(q.orderBy, tsCol)
    val windows = SearchWindows.windows(range, ascending)
    val out = Vector.newBuilder[org.apache.spark.sql.Row]
    var collected = 0
    var scanned = 0
    val it = windows.iterator
    while (collected < limit && it.hasNext) {
      val w = it.next()
      scanned += 1
      val sub = q.copy(dateRange = Some(w),
        limit = Some(limit - collected), offset = None)
      val rows = QueryCompiler.compile(sub, catalog, opts).collect()
      out ++= rows
      collected += rows.length
    }
    Page(out.result().toArray, scanned)
  }
}
