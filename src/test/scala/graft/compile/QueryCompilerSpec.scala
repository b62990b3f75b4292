package graft.compile

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.CoreFunctions
import graft.ir._

class QueryCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalog: Catalog = {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "api", "error", 100.0),
      (Timestamp.valueOf("2024-01-01 00:02:00"), "api", "ok", 10.0),
      (Timestamp.valueOf("2024-01-01 01:05:00"), "worker", "ok", 20.0),
      (Timestamp.valueOf("2024-01-01 01:06:00"), "worker", "error", 200.0),
      (Timestamp.valueOf("2024-01-01 02:00:00"), "api", "ok", 30.0))
      .toDF("ts", "svc", "status", "dur")
    new Catalog(Map("t" -> Source(df, timestampColumn = Some("ts"),
      implicitColumns = Seq("status"))))
  }

  private def compile(q: Query) = QueryCompiler.compile(q, catalog)

  test("one-level CTEs: outer query reads the named intermediate") {
    val inner = Query(
      select = Seq(
        SelectItem("svc", Some("svc"), None),
        SelectItem("dur", Some("dur"), None)),
      from = "t",
      where = Some(Cond.Sql("status = 'ok'")))
    val outer = Query(
      select = Seq(SelectItem("dur", Some("total"), Some(AggFn.Sum))),
      from = "oks",
      groupBy = Seq("svc"),
      orderBy = Seq(OrderBy("svc")),
      ctes = Seq("oks" -> inner))
    val got = compile(outer).as[(String, Double)].collect().toSeq
    assert(got == Seq(("api", 40.0), ("worker", 20.0)))
  }

  test("structured filters: include / exclude / numeric range / sql_ast") {
    def run(f: Filter, or: Boolean = false): Set[Double] =
      compile(Query(Seq(SelectItem("dur", Some("d"), None)), "t",
        filters = Seq(f), filtersOr = or)).as[Double].collect().toSet
    assert(run(Filter.Included("svc", Seq("worker"))) == Set(20.0, 200.0))
    assert(run(Filter.Excluded("svc", Seq("worker"))) ==
      Set(100.0, 10.0, 30.0))
    assert(run(Filter.NumRange("dur", 15, 150)) == Set(100.0, 20.0, 30.0))
    assert(run(Filter.SqlAst(">=", "dur", "100")) == Set(100.0, 200.0))
  }

  test("filters OR mode") {
    val got = compile(Query(Seq(SelectItem("dur", Some("d"), None)), "t",
      filters = Seq(Filter.Included("svc", Seq("worker")),
        Filter.NumRange("dur", 90, 110)),
      filtersOr = true)).as[Double].collect().toSet
    assert(got == Set(20.0, 200.0, 100.0))
  }

  test("limit + offset pagination") {
    def page(offset: Int): Seq[Double] =
      compile(Query(Seq(SelectItem("dur", Some("d"), None)), "t",
        orderBy = Seq(OrderBy("dur")), limit = Some(2),
        offset = Some(offset))).as[Double].collect().toSeq
    assert(page(0) == Seq(10.0, 20.0))
    assert(page(2) == Seq(30.0, 100.0))
    assert(page(4) == Seq(200.0))
  }

  test("splitColumnsExpression: the reference splitAndTrimWithBracket " +
      "battery (utils.test.ts:121-293) — depth-0 commas only") {
    def sp(s: String): Seq[String] = Catalog.splitColumnsExpression(s)
    assert(sp("column1, column2, column3") ==
      Seq("column1", "column2", "column3"))
    assert(sp("Timestamp, ServiceName, JSONExtractString(Body, 'c'), " +
      "JSONExtractString(Body, 'msg')") ==
      Seq("Timestamp", "ServiceName", "JSONExtractString(Body, 'c')",
        "JSONExtractString(Body, 'msg')"))
    assert(sp("col1, func1(a, b), col2, func2(c, func3(d, e)), col3") ==
      Seq("col1", "func1(a, b)", "col2", "func2(c, func3(d, e))", "col3"))
    assert(sp("col1, array[1, 2, 3], jsonb_path_query(data, '$[*]')") ==
      Seq("col1", "array[1, 2, 3]", "jsonb_path_query(data, '$[*]')"))
    assert(sp("col1, func(array[1, 2], obj['key']), col2['nested'][0]") ==
      Seq("col1", "func(array[1, 2], obj['key'])", "col2['nested'][0]"))
    assert(sp("  col1  ,   func(a, b)  ,  col2  ") ==
      Seq("col1", "func(a, b)", "col2"))
    assert(sp("") == Nil)
    assert(sp("   ") == Nil)
    assert(sp("col1,,col2, ,col3") == Seq("col1", "col2", "col3"))
    assert(sp("col1, concat('Hello, World!'), col2") ==
      Seq("col1", "concat('Hello, World!')", "col2"))
    assert(sp("col1, \"quoted, string\", col3") ==
      Seq("col1", "\"quoted, string\"", "col3"))
    assert(sp("col1, 'quoted, string', col3") ==
      Seq("col1", "'quoted, string'", "col3"))
    assert(sp("'it\\'s,ok' AS label, count()") ==
      Seq("'it\\'s,ok' AS label", "count()"))
    assert(sp("\"foo\\\"bar,baz\" AS label, count()") ==
      Seq("\"foo\\\"bar,baz\" AS label", "count()"))
    assert(sp("'it''s,ok' AS label, count()") ==
      Seq("'it''s,ok' AS label", "count()"))
    assert(sp("'path\\\\', count()") == Seq("'path\\\\'", "count()"))
    assert(sp("col1, \"double, quoted\", col2, 'single, quoted', col3") ==
      Seq("col1", "\"double, quoted\"", "col2", "'single, quoted'",
        "col3"))
    assert(sp("col1, func(\"text with , comma\", 'another, text'), col2")
      == Seq("col1", "func(\"text with , comma\", 'another, text')",
        "col2"))
    assert(sp("col1, \"string with (brackets, inside)\", col2, " +
      "'string with [brackets, inside]', col3") ==
      Seq("col1", "\"string with (brackets, inside)\"", "col2",
        "'string with [brackets, inside]'", "col3"))
    assert(sp("toDate(Timestamp) ASC, Time ASC, ServiceName DESC") ==
      Seq("toDate(Timestamp) ASC", "Time ASC", "ServiceName DESC"))
  }

  test("timestampBindings: DateTime token buckets, Date token prunes " +
      "(ref pickBucketTimestampColumn / HDX-4371)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("EventDate", DateType),
      StructField("EventTime", TimestampType),
      StructField("Body", StringType)))
    // multi-column: the DateTime is the bucket even though Date is first
    assert(Catalog.timestampBindings("EventDate, EventTime", schema) ==
      (Some("EventTime"), Some("EventDate")))
    // single timestamp column: itself, no pruning column
    assert(Catalog.timestampBindings("EventTime", schema) ==
      (Some("EventTime"), None))
    // no timestamp-typed token resolves → first token, like upstream
    assert(Catalog.timestampBindings("EventDate", schema) ==
      (Some("EventDate"), Some("EventDate")))
    // function-call tokens survive the split and fall through unresolved
    assert(Catalog.timestampBindings(
      "toStartOfHour(EventTime), EventTime", schema) ==
      (Some("EventTime"), None))
    assert(Catalog.timestampBindings("", schema) == (None, None))
  }

  test("alignDateRange floors the start and ceils the end to the step " +
      "(ref getAlignedDateRange, utils.test.ts:2397-2504)") {
    import java.time.Instant
    def a(f: String, t: String, step: Long): (String, String) = {
      val (x, y) = CoreFunctions.alignDateRange(
        Instant.parse(f), Instant.parse(t), step)
      (x.toString, y.toString)
    }
    // start 37s into the minute floors; already-aligned end stays
    assert(a("2025-11-26T12:23:37Z", "2025-11-26T12:25:00Z", 60) ==
      ("2025-11-26T12:23:00Z", "2025-11-26T12:25:00Z"))
    // end 42s into the minute ceils
    assert(a("2025-11-26T12:23:00Z", "2025-11-26T12:25:42Z", 60) ==
      ("2025-11-26T12:23:00Z", "2025-11-26T12:26:00Z"))
    // 5-minute step aligns both sides
    assert(a("2025-11-26T12:23:17Z", "2025-11-26T12:27:42Z", 300) ==
      ("2025-11-26T12:20:00Z", "2025-11-26T12:30:00Z"))
    // a degenerate range still spans at least one full bucket
    assert(a("2025-11-26T12:23:17Z", "2025-11-26T12:23:17Z", 60) ==
      ("2025-11-26T12:23:00Z", "2025-11-26T12:24:00Z"))
    // a fractional second past a boundary ceils UP (align only widens)
    assert(a("2025-11-26T12:00:00Z", "2025-11-26T12:05:00.500Z", 300) ==
      ("2025-11-26T12:00:00Z", "2025-11-26T12:10:00Z"))
  }

  test("auto granularity picks the ladder step for <=60 buckets") {
    // 3h range → 3h/60 = 180s → first ladder step ≥ that keeping ≤60
    // buckets is 5m (10800/300=36 ≤ 60; 60s would give 180 buckets)
    assert(CoreFunctions.autoGranularitySeconds(3 * 3600) == 300)
    val q = Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "t",
      granularity = Some(Granularity.Auto),
      dateRange = Some(QueryCompiler.range(
        "2024-01-01T00:00:00Z", "2024-01-01T03:00:00Z")))
    val buckets = compile(q).count()
    assert(buckets <= 60)
  }

  test("lucene having over aggregated aliases") {
    val q = Query(
      select = Seq(SelectItem("dur", Some("total"), Some(AggFn.Sum))),
      from = "t",
      groupBy = Seq("svc"),
      having = Some(Cond.Lucene("total:>150")),
      orderBy = Seq(OrderBy("svc")))
    val got = compile(q).as[(String, Double)].collect().toSeq
    assert(got == Seq(("worker", 220.0)))
  }

  test("time range exclusive end") {
    val q = Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "t",
      dateRange = Some(DateRange(
        java.time.Instant.parse("2024-01-01T00:00:00Z"),
        java.time.Instant.parse("2024-01-01T02:00:00Z"),
        inclusiveEnd = false)))
    assert(compile(q).as[Long].head() == 4L)
  }

  test("NoAgg passthrough mixes with aggregates being absent") {
    val q = Query(
      select = Seq(
        SelectItem("svc", Some("svc"), Some(AggFn.NoAgg)),
        SelectItem("dur * 2", Some("dur2"), None)),
      from = "t",
      orderBy = Seq(OrderBy("dur2")))
    val got = compile(q).as[(String, Double)].collect().toSeq
    assert(got.head == ("api", 20.0))
    assert(got.length == 5)
  }

  test("sessions source: rrweb shape + session-id lucene through maps") {
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 00:02:00"), 7L, "error", 2.0),
      (3L, Timestamp.valueOf("2024-01-01 00:03:00"), 8L, "view", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val sess = Catalog.sessionsFrame(events)
    // hyperdx_sessions column surface (00004_hyperdx_sessions.sql)
    assert(Seq("Timestamp", "TraceId", "SpanId", "SeverityText",
      "ServiceName", "Body", "ResourceAttributes", "LogAttributes")
      .forall(sess.columns.contains))
    val cat2 = new Catalog(Map("sessions" -> Source(sess,
      timestampColumn = Some("Timestamp"),
      jsonStringColumns = Set("Body"),
      fieldAliases = Map(
        "session_id" -> "ResourceAttributes.rum.sessionId"))))
    // per-session counts: lucene existence via the alias into the map,
    // rrweb FullSnapshot (type 2 = the 'view' rows) via JSON dot-path
    val q = Query(
      select = Seq(
        SelectItem("", Some("cnt"), Some(AggFn.Count)),
        SelectItem("", Some("snaps"), Some(AggFn.Count),
          Some(Cond.Lucene("Body.type:2")))),
      from = "sessions",
      where = Some(Cond.Lucene("session_id:*")),
      groupBy = Seq("ResourceAttributes['rum.sessionId']"),
      orderBy = Seq(OrderBy("ResourceAttributes['rum.sessionId']")))
    val got = QueryCompiler.compile(q, cat2)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("sess-7", 2L, 0L), ("sess-8", 1L, 1L)))
  }
}
