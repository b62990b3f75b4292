package graft.compile

import java.sql.Timestamp

import graft.SparkSpec
import graft.ir._

/** Round-trip proof for the IR → SQL-text renderer: for every renderable
  * query shape, `spark.sql(BuilderSql.render(q))` over a temp view named
  * like `q.from` must reproduce `QueryCompiler.compile(q)` column-for-column
  * and row-for-row (the reference pins builderToRawSql the same way in its
  * 810-LoC builderToRawSql.test.ts). Non-renderable shapes must return the
  * documented Left reasons. */
class BuilderSqlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalog: Catalog = {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "api", "error", 100.0, "a"),
      (Timestamp.valueOf("2024-01-01 00:02:00"), "api", "ok", 10.0, "a"),
      (Timestamp.valueOf("2024-01-01 00:04:00"), "api", "ok", 15.0, "b"),
      (Timestamp.valueOf("2024-01-01 01:05:00"), "worker", "ok", 20.0, "b"),
      (Timestamp.valueOf("2024-01-01 01:06:00"), "worker", "error", 200.0, "c"),
      (Timestamp.valueOf("2024-01-01 02:00:00"), "api", "ok", 30.0, "c"),
      (Timestamp.valueOf("2024-01-01 02:30:00"), "worker", "timeout error", 60.0, "d"))
      .toDF("ts", "svc", "status", "dur", "host")
    df.createOrReplaceTempView("t")
    new Catalog(Map("t" -> Source(df, timestampColumn = Some("ts"),
      implicitColumns = Seq("status"))))
  }

  private def assertRoundTrip(q: Query): Unit = {
    val sql = BuilderSql.render(q, catalog) match {
      case Right(s) => s
      case Left(reason) => fail(s"expected renderable, got: $reason")
    }
    val viaSql = spark.sql(sql)
    val compiled = QueryCompiler.compile(q, catalog)
    assert(viaSql.columns.toSeq == compiled.columns.toSeq,
      s"column drift for:\n$sql")
    // queries with an explicit ORDER BY (the spec corpus orders on unique
    // keys) must round-trip the row ORDER too, not just the row set
    if (q.orderBy.nonEmpty) {
      val a = viaSql.collect().map(_.toString).toSeq
      val b = compiled.collect().map(_.toString).toSeq
      assert(a == b, s"row/order drift for:\n$sql")
    } else {
      val a = viaSql.collect().map(_.toString).sorted.toSeq
      val b = compiled.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"row drift for:\n$sql")
    }
  }

  test("projection + sql where + order + limit/offset") {
    assertRoundTrip(Query(
      select = Seq(
        SelectItem("svc", Some("svc")),
        SelectItem("dur * 2", Some("dur2"))),
      from = "t",
      where = Some(Cond.Sql("dur >= 15")),
      orderBy = Seq(OrderBy("dur2", desc = true)),
      limit = Some(3), offset = Some(1)))
  }

  test("grouped aggregate battery: count/sum/avg/min/max/quantile") {
    assertRoundTrip(Query(
      select = Seq(
        SelectItem("", Some("cnt"), Some(AggFn.Count)),
        SelectItem("dur", Some("total"), Some(AggFn.Sum)),
        SelectItem("dur", Some("mean"), Some(AggFn.Avg)),
        SelectItem("dur", Some("lo"), Some(AggFn.Min)),
        SelectItem("dur", Some("hi"), Some(AggFn.Max)),
        SelectItem("dur", Some("p50"), Some(AggFn.Quantile(0.5)))),
      from = "t",
      groupBy = Seq("svc"),
      orderBy = Seq(OrderBy("svc"))))
  }

  test("count_distinct + last_value (max_by over the ts column)") {
    assertRoundTrip(Query(
      select = Seq(
        SelectItem("host", Some("hosts"), Some(AggFn.CountDistinct)),
        SelectItem("dur", Some("last_dur"), Some(AggFn.LastValue))),
      from = "t",
      groupBy = Seq("svc"),
      orderBy = Seq(OrderBy("svc"))))
  }

  test("time series: fixed granularity + dateRange prepends the bucket") {
    assertRoundTrip(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "t",
      groupBy = Seq("svc"),
      granularity = Some(Granularity.Fixed(3600)),
      dateRange = Some(QueryCompiler.range(
        "2024-01-01T00:00:00Z", "2024-01-01T02:00:00Z"))))
  }

  test("lucene where: field match + numeric comparison") {
    assertRoundTrip(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "t",
      where = Some(Cond.Lucene("status:error dur:>50")),
      groupBy = Seq("svc"),
      orderBy = Seq(OrderBy("svc"))))
  }

  test("lucene where: free-text token over the implicit column") {
    assertRoundTrip(Query(
      select = Seq(SelectItem("dur", Some("dur"))),
      from = "t",
      where = Some(Cond.Lucene("error")),
      orderBy = Seq(OrderBy("dur"))))
  }

  test("conditional aggregation renders as FILTER (WHERE …)") {
    assertRoundTrip(Query(
      select = Seq(
        SelectItem("", Some("errors"), Some(AggFn.Count),
          Some(Cond.Sql("status = 'error'"))),
        SelectItem("dur", Some("ok_dur"), Some(AggFn.Sum),
          Some(Cond.Sql("status = 'ok'")))),
      from = "t",
      groupBy = Seq("svc"),
      orderBy = Seq(OrderBy("svc"))))
  }

  test("structured filters AND / OR modes") {
    assertRoundTrip(Query(
      select = Seq(SelectItem("dur", Some("dur"))),
      from = "t",
      filters = Seq(
        Filter.Included("svc", Seq("api")),
        Filter.NumRange("dur", 10, 40)),
      orderBy = Seq(OrderBy("dur"))))
    assertRoundTrip(Query(
      select = Seq(SelectItem("dur", Some("dur"))),
      from = "t",
      filters = Seq(
        Filter.Excluded("svc", Seq("api")),
        Filter.NumRange("dur", 10, 15)),
      filtersOr = true,
      orderBy = Seq(OrderBy("dur"))))
  }

  test("sql HAVING over output aliases") {
    assertRoundTrip(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "t",
      groupBy = Seq("status"),
      having = Some(Cond.Sql("cnt >= 2")),
      orderBy = Seq(OrderBy("status"))))
  }

  test("lucene HAVING resolves against output aliases and renders") {
    assertRoundTrip(Query(
      select = Seq(
        SelectItem("", Some("cnt"), Some(AggFn.Count)),
        SelectItem("dur", Some("total"), Some(AggFn.Sum))),
      from = "t",
      groupBy = Seq("status"),
      having = Some(Cond.Lucene("cnt:>=2 AND total:>20")),
      orderBy = Seq(OrderBy("status"))))
  }

  test("computed group expression keeps its verbatim name on both paths") {
    assertRoundTrip(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "t",
      groupBy = Seq("upper(svc)"),
      orderBy = Seq(OrderBy("upper(svc)"))))
  }

  test("groupBy without aggregates is rejected (compile ignores it)") {
    val q = Query(
      select = Seq(SelectItem("dur", Some("dur"))),
      from = "t",
      groupBy = Seq("svc"))
    val reason = BuilderSql.render(q, catalog)
      .swap.getOrElse(fail("expected Left"))
    assert(reason.contains("groupBy without aggregates"))
  }

  test("non-renderable shapes return the documented reasons") {
    val base = Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "t")
    def reason(q: Query): String =
      BuilderSql.render(q, catalog).swap.getOrElse(fail("expected Left"))

    assert(reason(base.copy(ctes = Seq("x" -> base)))
      .contains("CTE"))
    assert(reason(base.copy(groupBy = Seq("svc"),
      seriesLimit = Some(2))).contains("series-limit"))
    assert(reason(base.copy(granularity = Some(Granularity.Auto)))
      .contains("auto granularity"))
  }

  test("auto granularity resolves from the dateRange like the compiler") {
    assertRoundTrip(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "t",
      granularity = Some(Granularity.Auto),
      dateRange = Some(QueryCompiler.range(
        "2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z"))))
  }
}
