package graft.compile

import java.time.Instant

import graft.SparkSpec

class RawSqlSpec extends SparkSpec {
  import spark.implicits._

  private val range = Some((Instant.parse("2024-01-01T00:00:00Z"),
    Instant.parse("2024-01-02T00:00:00Z")))

  test("time-range macros expand to second/ms/date bounds") {
    val cfg = RawSql.Config("", dateRange = range, stepSeconds = Some(300))
    def x(t: String) = RawSql.replaceMacros(cfg.copy(sqlTemplate = t))
    assert(x("$__fromTime") == "timestamp_seconds(1704067200L)")
    assert(x("$__toTime_ms") == "timestamp_millis(1704153600000L)")
    assert(x("$__timeFilter(ts)") ==
      "ts >= timestamp_seconds(1704067200L) AND " +
        "ts <= timestamp_seconds(1704153600L)")
    assert(x("$__dateFilter(d)") ==
      "d >= to_date(timestamp_millis(1704067200000L)) AND " +
        "d <= to_date(timestamp_millis(1704153600000L))")
    assert(x("$__dt(d, t)").contains("(d >= to_date"))
    assert(x("$__interval_s") == "300")
    assert(x("$__timeInterval(ts)") ==
      "timestamp_seconds(CAST(floor(unix_timestamp(ts) / 300) AS BIGINT)" +
        " * 300)")
    // maximal munch: _ms variant is not misread as the shorter macro
    assert(x("$__timeFilter_ms(ts)").contains("timestamp_millis"))
  }

  test("filters and sourceTable macros") {
    val base = RawSql.Config("", from = Some("events"))
    def x(cfg: RawSql.Config) = RawSql.replaceMacros(cfg)
    assert(x(base.copy(sqlTemplate = "$__filters")) ==
      "(1=1 /* no filters applied */)")
    assert(x(base.copy(sqlTemplate = "$__filters",
      filtersSql = Some("a = 1"))) == "a = 1")
    assert(x(base.copy(sqlTemplate = "FROM $__sourceTable")) ==
      "FROM `events`")
    val metric = base.copy(metricTables = Map("gauge" -> "metrics_gauge"))
    assert(x(metric.copy(sqlTemplate = "$__sourceTable(gauge)")) ==
      "`metrics_gauge`")
    intercept[RawSql.MacroException](
      x(metric.copy(sqlTemplate = "$__sourceTable"))) // type required
    intercept[RawSql.MacroException](
      x(base.copy(sqlTemplate = "$__sourceTable(bogus)",
        metricTables = Map("gauge" -> "g"))))
    intercept[RawSql.MacroException](
      x(RawSql.Config("$__sourceTable"))) // no source
    intercept[RawSql.MacroException](
      x(base.copy(sqlTemplate = "$__timeFilter(a, b)",
        dateRange = range))) // arity
    intercept[RawSql.MacroException](
      x(base.copy(sqlTemplate = "$__nope")))
  }

  test("nested parens and multiple args parse correctly") {
    val cfg = RawSql.Config("$__timeFilter(toDateTime(x, 3))",
      dateRange = range)
    assert(RawSql.replaceMacros(cfg).startsWith("toDateTime(x, 3) >= "))
  }

  test("template executes over catalog temp views") {
    val df = Seq(
      ("2024-01-01 00:10:00", "error", 1.0),
      ("2024-01-01 05:00:00", "click", 2.0),
      ("2024-01-03 00:00:00", "error", 4.0)) // outside range
      .toDF("s", "event_type", "value")
      .selectExpr("CAST(s AS TIMESTAMP) AS ts", "event_type", "value")
    val catalog = new Catalog(Map("events" -> Source(df)))
    val cfg = RawSql.Config(
      sqlTemplate = "SELECT count(*) AS c, sum(value) AS s " +
        "FROM $__sourceTable WHERE $__timeFilter(ts) AND $__filters",
      from = Some("events"),
      dateRange = range,
      filtersSql = Some("event_type IN ('error', 'click')"))
    val out = RawSql.run(spark, cfg, catalog)
      .as[(Long, Double)].head()
    assert(out == ((2L, 3.0)))
  }
}
