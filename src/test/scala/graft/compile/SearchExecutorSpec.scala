package graft.compile

import java.sql.Timestamp

import graft.SparkSpec
import graft.ir._

class SearchExecutorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalog: Catalog = {
    // events every 10 minutes across 2 days
    val rows = (0 until 288).map { i =>
      (Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(i * 600L)), i.toLong)
    }
    new Catalog(Map("logs" -> Source(rows.toDF("ts", "n"),
      timestampColumn = Some("ts"))))
  }

  private val range = QueryCompiler.range(
    "2024-01-01T00:00:00Z", "2024-01-03T00:00:00Z")

  test("newest-first search satisfied from the first 15m window") {
    val q = Query(
      select = Seq(SelectItem("n", Some("n"), None)),
      from = "logs",
      dateRange = Some(range),
      orderBy = Seq(OrderBy("ts", desc = true)),
      limit = Some(1))
    val page = SearchExecutor.paginate(q, catalog)
    assert(page.windowsScanned == 1) // only the newest 15m window ran
    assert(page.rows.head.getLong(0) == 287L) // the newest row
  }

  test("limit spanning windows accumulates in ladder order") {
    val q = Query(
      select = Seq(SelectItem("n", Some("n"), None)),
      from = "logs",
      dateRange = Some(range),
      orderBy = Seq(OrderBy("ts", desc = true)),
      limit = Some(50))
    val page = SearchExecutor.paginate(q, catalog)
    // newest window (15m ending at the exclusive range end that holds the
    // last point) + enough 6h windows to reach 50 rows
    assert(page.rows.length == 50)
    assert(page.windowsScanned > 1)
    val ns = page.rows.map(_.getLong(0)).toSeq
    assert(ns.head == 287L)
    assert(ns.toSet == (238L to 287L).toSet) // the 50 newest, no gaps
  }

  test("ascending when first ORDER BY is ts asc: oldest first") {
    val q = Query(
      select = Seq(SelectItem("n", Some("n"), None)),
      from = "logs",
      dateRange = Some(range),
      orderBy = Seq(OrderBy("ts")),
      limit = Some(3))
    val page = SearchExecutor.paginate(q, catalog)
    assert(page.rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // the first 15m window holds only rows 0,1 (10-minute spacing);
    // row 2 comes from the second window
    assert(page.windowsScanned == 2)
  }
}
