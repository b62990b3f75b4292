package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.{Catalog, QueryCompiler}
import graft.functions.CoreFunctions._
import graft.ir._

/** The engine's query surface, exposed as (SparkSession, sfDir) => DataFrame
  * pairs with DuckDB oracle SQL. Observability-shaped queries route through
  * the IR compiler (graft.compile.QueryCompiler) — the Spark-native
  * equivalent of the reference's renderChartConfig; analytical joins use the
  * DataFrame API directly.
  *
  * Conventions for oracle parity (driver compares column-sorted value
  * hashes):
  *  - every aggregate/computed column is aliased identically on both sides
  *  - big float sums rounded to 2 decimals, averages/quantiles to 4–6
  *  - time buckets emitted as epoch-second BIGINT named `bucket`
  *  - every query ends with a fully deterministic ORDER BY
  */
object Queries {

  private val JanRange = QueryCompiler.range(
    "2024-01-01T00:00:00Z", "2024-03-01T00:00:00Z")

  /** Memoized catalog per (session, dir) — the analogue of the reference's
    * MetadataCache (metadata.ts:153): without it every query re-reads ten
    * parquet footers for schema discovery. */
  private val catalogCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      Catalog]()

  def cat(spark: SparkSession, dir: String): Catalog =
    catalogCache.computeIfAbsent((spark, dir),
      _ => Catalog.forDir(spark, dir))

  /** epoch-seconds BIGINT bucket from the generated __time_bucket column. */
  private def epochBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", unix_timestamp(col(TimeBucketAlias)))
      .drop(TimeBucketAlias)

  private def compiled(q: Query)(spark: SparkSession, dir: String)
      : DataFrame =
    QueryCompiler.compile(q, cat(spark, dir))

  // ================================================================ queries

  /** TPC-H Q1-style pricing summary — the reference's `groupBy + multi-agg`
    * shape (SURVEY §2.4) on lineitem. */
  def q1_agg(spark: SparkSession, dir: String): DataFrame = {
    val df = compiled(Query(
      select = Seq(
        SelectItem("l_quantity", Some("sum_qty"), Some(AggFn.Sum)),
        SelectItem("l_extendedprice", Some("sum_base_price"), Some(AggFn.Sum)),
        SelectItem("l_extendedprice*(1-l_discount)", Some("sum_disc_price"),
          Some(AggFn.Sum)),
        SelectItem("l_discount", Some("__sum_disc"), Some(AggFn.Sum)),
        SelectItem("", Some("count_order"), Some(AggFn.Count))),
      from = "lineitem",
      groupBy = Seq("l_returnflag", "l_linestatus"),
      orderBy = Seq(OrderBy("l_returnflag"), OrderBy("l_linestatus"))))(
      spark, dir)
    // averages derived from ROUNDED sums so both engines divide identical
    // doubles (raw-avg ulp differences flip rounding at exact half
    // boundaries — see the q32 note)
    df.withColumn("sum_qty", round(col("sum_qty"), 2))
      .withColumn("sum_base_price", round(col("sum_base_price"), 2))
      .withColumn("sum_disc_price", round(col("sum_disc_price"), 2))
      .withColumn("avg_qty",
        round(col("sum_qty") / col("count_order"), 6))
      .withColumn("avg_price",
        round(col("sum_base_price") / col("count_order"), 6))
      .withColumn("avg_disc",
        round(round(col("__sum_disc"), 2) / col("count_order"), 6))
      .drop("__sum_disc")
  }

  val q1_sql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | round(sum(l_extendedprice),2) AS sum_base_price,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      | round(round(sum(l_quantity),2) / count(*),6) AS avg_qty,
      | round(round(sum(l_extendedprice),2) / count(*),6) AS avg_price,
      | round(round(sum(l_discount),2) / count(*),6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection (predicate/column pushdown to the parquet scan). */
  def q2_filter(spark: SparkSession, dir: String): DataFrame =
    compiled(Query(
      select = Seq(
        SelectItem("l_orderkey", Some("l_orderkey")),
        SelectItem("l_linenumber", Some("l_linenumber")),
        SelectItem("l_quantity", Some("l_quantity"))),
      from = "lineitem",
      where = Some(Cond.Sql("l_quantity > 45 AND l_returnflag = 'R'")),
      orderBy = Seq(OrderBy("l_orderkey"), OrderBy("l_linenumber"))))(
      spark, dir)

  val q2_sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity > 45 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Multi-way join with broadcast dims: revenue per nation (TPC-H Q5-ish;
    * the engine's cross-source correlation shape, SURVEY §2.6). */
  def q3_join(spark: SparkSession, dir: String): DataFrame = {
    val c = cat(spark, dir)
    val li = c("lineitem").df
    val ord = c("orders").df
    val cust = c("customer").df
    val nat = c("nation").df
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val q3_sql: String =
    """SELECT n_name,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Hourly time-series aggregation (the reference's core chart shape:
    * toStartOfInterval bucketing + groupBy, SURVEY §2.4/§2.11). */
  def q4_timeseries(spark: SparkSession, dir: String): DataFrame = {
    val df = compiled(Query(
      select = Seq(
        SelectItem("", Some("cnt"), Some(AggFn.Count)),
        SelectItem("value", Some("sum_val"), Some(AggFn.Sum))),
      from = "events",
      groupBy = Seq("event_type"),
      granularity = Some(Granularity.Fixed(3600)),
      dateRange = Some(JanRange),
      orderBy = Seq(OrderBy("event_type"))))(spark, dir)
    epochBucket(df)
      .withColumn("sum_val", round(col("sum_val"), 2))
      // avg from the rounded sum: per-bucket counts are small (often
      // powers of two) where raw avgs sit on rounding half-boundaries
      .withColumn("avg_val", round(col("sum_val") / col("cnt"), 6))
      .select("bucket", "event_type", "cnt", "sum_val", "avg_val")
      .orderBy("bucket", "event_type")
  }

  val q4_sql: String =
    """SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS bucket,
      | event_type, count(*) AS cnt,
      | round(sum(value),2) AS sum_val,
      | round(round(sum(value),2) / count(*),6) AS avg_val
      |FROM events
      |WHERE ts >= '2024-01-01T00:00:00Z' AND ts <= '2024-03-01T00:00:00Z'
      |GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin

  /** Lucene search language → predicate (SURVEY §2.3): field match +
    * numeric comparison, implicit AND. */
  def q5_lucene(spark: SparkSession, dir: String): DataFrame =
    compiled(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "events",
      where = Some(Cond.Lucene("event_type:error value:>100")),
      groupBy = Seq("user_id"),
      orderBy = Seq(OrderBy("user_id"))))(spark, dir)

  val q5_sql: String =
    """SELECT user_id, count(*) AS cnt FROM events
      |WHERE lower(event_type) LIKE '%error%' AND value > 100
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** JSON dot-path field resolution (reference
    * buildColumnExpressionFromField → JSONExtractString branch). */
  def q6_json(spark: SparkSession, dir: String): DataFrame =
    compiled(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "events",
      where = Some(Cond.Lucene("props.k:>50 event_type:purchase")),
      groupBy = Seq("user_id"),
      orderBy = Seq(OrderBy("user_id"))))(spark, dir)

  val q6_sql: String =
    """SELECT user_id, count(*) AS cnt FROM events
      |WHERE CAST(json_extract_string(props,'$.k') AS DOUBLE) > 50
      | AND lower(event_type) LIKE '%purchase%'
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Conditional aggregation (ClickHouse fnIf / SQL FILTER) + the
    * OR-of-conditions WHERE pushdown (reference renderWhere :1165-1193). */
  def q7_conditional(spark: SparkSession, dir: String): DataFrame = {
    val df = compiled(Query(
      select = Seq(
        SelectItem("", Some("errors"), Some(AggFn.Count),
          Some(Cond.Sql("event_type = 'error'"))),
        SelectItem("", Some("purchases"), Some(AggFn.Count),
          Some(Cond.Sql("event_type = 'purchase'"))),
        SelectItem("value", Some("purchase_value"), Some(AggFn.Sum),
          Some(Cond.Sql("event_type = 'purchase'")))),
      from = "events",
      groupBy = Seq("user_id"),
      orderBy = Seq(OrderBy("user_id"))))(spark, dir)
    df.withColumn("purchase_value", round(col("purchase_value"), 2))
  }

  val q7_sql: String =
    """SELECT user_id,
      | count(*) FILTER (WHERE event_type = 'error') AS errors,
      | count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
      | round(sum(value) FILTER (WHERE event_type = 'purchase'),2)
      |   AS purchase_value
      |FROM events
      |WHERE event_type = 'error' OR event_type = 'purchase'
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Quantiles (ClickHouse quantile(l) → exact percentile for oracle
    * parity; percentile_approx on the 100 TB path). */
  def q8_quantile(spark: SparkSession, dir: String): DataFrame = {
    val df = compiled(Query(
      select = Seq(
        SelectItem("value", Some("p50"), Some(AggFn.Quantile(0.5))),
        SelectItem("value", Some("p90"), Some(AggFn.Quantile(0.9))),
        SelectItem("value", Some("p99"), Some(AggFn.Quantile(0.99)))),
      from = "events",
      groupBy = Seq("event_type"),
      orderBy = Seq(OrderBy("event_type"))))(spark, dir)
    df.withColumn("p50", round(col("p50"), 4))
      .withColumn("p90", round(col("p90"), 4))
      .withColumn("p99", round(col("p99"), 4))
  }

  val q8_sql: String =
    """SELECT event_type,
      | round(quantile_cont(value, 0.5),4) AS p50,
      | round(quantile_cont(value, 0.9),4) AS p90,
      | round(quantile_cont(value, 0.99),4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** count_distinct (+ plain count). */
  def q9_count_distinct(spark: SparkSession, dir: String): DataFrame =
    compiled(Query(
      select = Seq(
        SelectItem("user_id", Some("users"), Some(AggFn.CountDistinct)),
        SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "events",
      groupBy = Seq("event_type"),
      orderBy = Seq(OrderBy("event_type"))))(spark, dir)

  val q9_sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS users,
      | count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** HAVING + ORDER BY DESC + LIMIT (top-k users). */
  def q10_having(spark: SparkSession, dir: String): DataFrame =
    compiled(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "events",
      groupBy = Seq("user_id"),
      having = Some(Cond.Sql("cnt >= 10")),
      orderBy = Seq(OrderBy("cnt", desc = true), OrderBy("user_id")),
      limit = Some(20)))(spark, dir)

  val q10_sql: String =
    """SELECT user_id, count(*) AS cnt FROM events
      |GROUP BY user_id HAVING count(*) >= 10
      |ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin

  /** Top-N series cap via ranked semi-join
    * (reference __hdx_series_limit CTE, renderChartConfig.ts:1308-1431). */
  def q11_series_limit(spark: SparkSession, dir: String): DataFrame = {
    val df = compiled(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "events",
      groupBy = Seq("event_type"),
      granularity = Some(Granularity.Fixed(86400)),
      dateRange = Some(JanRange),
      seriesLimit = Some(3)))(spark, dir)
    epochBucket(df)
      .select("bucket", "event_type", "cnt")
      .orderBy("bucket", "event_type")
  }

  val q11_sql: String =
    """WITH agg AS (
      |  SELECT CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS bucket,
      |    event_type, count(*) AS cnt
      |  FROM events
      |  WHERE ts >= '2024-01-01T00:00:00Z' AND ts <= '2024-03-01T00:00:00Z'
      |  GROUP BY bucket, event_type),
      |top3 AS (
      |  SELECT event_type FROM (
      |    SELECT event_type, max(cnt) AS m FROM agg GROUP BY event_type)
      |  ORDER BY m DESC, event_type LIMIT 3)
      |SELECT bucket, event_type, cnt FROM agg
      |WHERE event_type IN (SELECT event_type FROM top3)
      |ORDER BY bucket, event_type""".stripMargin

  /** Ratio share_of_total (reference computeResultSetRatio /
    * buildBucketTotalDenominator). The grand total comes from a 1-row
    * aggregate broadcast-cross-joined back onto the per-group frame — an
    * unpartitioned window (`Window.partitionBy()`) would funnel every row
    * through a single partition, a trap at scale even when the input is
    * post-aggregation-small. */
  def q12_ratio(spark: SparkSession, dir: String): DataFrame = {
    val events = cat(spark, dir)("events").df
    val perGroup = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val total = perGroup.agg(sum(col("cnt")).as("__total"))
    perGroup.crossJoin(broadcast(total))
      .withColumn("share", round(col("cnt") / col("__total"), 6))
      .drop("__total")
      .orderBy("event_type")
  }

  val q12_sql: String =
    """SELECT event_type, cnt, round(cnt / sum(cnt) OVER (), 6) AS share
      |FROM (SELECT event_type, count(*) AS cnt FROM events
      |      GROUP BY event_type)
      |ORDER BY event_type""".stripMargin

  /** Unquoted-URL lucene term (reference encodeSpecialTokens
    * queryParser.ts:32-48): `url:https://example.com/src1/STAR` (STAR =
    * the wildcard char, which can't appear literally in a Scala comment)
    * parses as ONE term via the parser's encode/decode pre-pass — no
    * quoting — and compiles to a wildcard match on a derived url column. */
  def q49_lucene_url(spark: SparkSession, dir: String): DataFrame = {
    val base = cat(spark, dir)
    val withUrl = base("documents").df.withColumn("url",
      concat(lit("https://example.com/"), col("source"), lit("/"),
        col("doc_id")))
    val c = base.withSource("doc_urls",
      graft.compile.Source(withUrl, implicitColumns = Seq("text")))
    QueryCompiler.compile(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "doc_urls",
      where = Some(Cond.Lucene("url:https://example.com/src1/*")),
      groupBy = Seq("lang"),
      orderBy = Seq(OrderBy("lang"))), c)
  }

  val q49_sql: String =
    """SELECT lang, count(*) AS cnt FROM (
      |  SELECT lang,
      |    concat('https://example.com/', source, '/', doc_id) AS url
      |  FROM documents)
      |WHERE url LIKE 'https://example.com/src1/%'
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** BuilderSql end-to-end: render an IR Query as one raw-SQL statement
    * (the reference's builderToRawSql,
    * packages/common-utils/src/core/builderToRawSql.ts:1-176) and EXECUTE
    * the rendered text with spark.sql — gating that the text path produces
    * the same answer as the DataFrame compiler path would. Exercises the
    * time bucket, lucene WHERE, FILTER (WHERE …) conditional aggregation
    * and group echo of the renderer. */
  def q54_buildersql(spark: SparkSession, dir: String): DataFrame = {
    import graft.compile.BuilderSql
    val c = cat(spark, dir)
    val q = Query(
      select = Seq(
        SelectItem("", Some("cnt"), Some(AggFn.Count)),
        SelectItem("value", Some("even_v"), Some(AggFn.Sum),
          Some(Cond.Sql("user_id % 2 = 0"))),
        SelectItem("value", Some("max_v"), Some(AggFn.Max))),
      from = "events",
      where = Some(Cond.Lucene("value:>0.5")),
      groupBy = Seq("event_type"),
      granularity = Some(Granularity.Fixed(86400)),
      dateRange = Some(JanRange))
    val sql = BuilderSql.render(q, c).fold(
      reason => throw new IllegalStateException(s"not renderable: $reason"),
      identity)
    c("events").df.createOrReplaceTempView("events")
    epochBucket(spark.sql(sql))
      .withColumn("even_v", round(col("even_v"), 2))
      .withColumn("max_v", round(col("max_v"), 2))
      .select("bucket", "event_type", "cnt", "even_v", "max_v")
      .orderBy("bucket", "event_type")
  }

  val q54_sql: String =
    """SELECT CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS bucket,
      | event_type, count(*) AS cnt,
      | round(sum(value) FILTER (WHERE user_id % 2 = 0), 2) AS even_v,
      | round(max(value), 2) AS max_v
      |FROM events
      |WHERE ts >= '2024-01-01T00:00:00Z' AND ts <= '2024-03-01T00:00:00Z'
      |  AND value > 0.5
      |GROUP BY bucket, event_type ORDER BY bucket, event_type""".stripMargin

  /** String-typed numeric aggregation (reference toFloat64OrDefault
    * semantics — FIXTURES §4: numeric aggs over string columns must
    * coerce) + deterministic last_value via max_by(ts): aggregates over
    * the JSON-string field props.k. */
  def q36_string_coercion(spark: SparkSession, dir: String): DataFrame = {
    val df = compiled(Query(
      select = Seq(
        SelectItem("get_json_object(props, '$.k')", Some("sum_k"),
          Some(AggFn.Sum)),
        SelectItem("get_json_object(props, '$.k')", Some("min_k"),
          Some(AggFn.Min)),
        SelectItem("get_json_object(props, '$.k')", Some("max_k"),
          Some(AggFn.Max)),
        SelectItem("get_json_object(props, '$.k')", Some("last_k"),
          Some(AggFn.LastValue)),
        SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "events",
      groupBy = Seq("event_type"),
      orderBy = Seq(OrderBy("event_type"))))(spark, dir)
    df.withColumn("sum_k", round(col("sum_k"), 2))
      .withColumn("last_k", col("last_k").cast("double"))
  }

  val q36_sql: String =
    """SELECT event_type,
      | round(sum(CAST(json_extract_string(props,'$.k') AS DOUBLE)),2)
      |   AS sum_k,
      | min(CAST(json_extract_string(props,'$.k') AS DOUBLE)) AS min_k,
      | max(CAST(json_extract_string(props,'$.k') AS DOUBLE)) AS max_k,
      | CAST(arg_max(json_extract_string(props,'$.k'), ts) AS DOUBLE)
      |   AS last_k,
      | count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Sample-weighted aggregation at the driver gate (reference
    * renderChartConfig.ts:556-624): user_id%7+1 as the SampleRate weight;
    * weighted count/sum plus nearest-rank weighted p50 — integer
    * cumulative weights keep the oracle comparison float-exact. */
  def q39_weighted(spark: SparkSession, dir: String): DataFrame = {
    val base = cat(spark, dir)
    val weighted = base.withSource("weighted_events",
      base("events").copy(
        sampleWeightExpression = Some("(user_id % 7) + 1")))
    val df = QueryCompiler.compile(Query(
      select = Seq(
        SelectItem("", Some("wcount"), Some(AggFn.Count)),
        SelectItem("value", Some("wsum"), Some(AggFn.Sum)),
        SelectItem("value", Some("wp50"), Some(AggFn.Quantile(0.5)))),
      from = "weighted_events",
      groupBy = Seq("event_type"),
      orderBy = Seq(OrderBy("event_type"))), weighted)
    df.withColumn("wsum", round(col("wsum"), 2))
  }

  val q39_sql: String =
    """WITH w AS (
      |  SELECT event_type, value, (user_id % 7) + 1 AS wt FROM events),
      |r AS (
      |  SELECT event_type, value, wt,
      |    sum(wt) OVER (PARTITION BY event_type ORDER BY value
      |                  ROWS UNBOUNDED PRECEDING) AS cumw,
      |    sum(wt) OVER (PARTITION BY event_type) AS total
      |  FROM w)
      |SELECT event_type,
      |  CAST(max(total) AS BIGINT) AS wcount,
      |  round(sum(value * wt), 2) AS wsum,
      |  min(value) FILTER (WHERE cumw >= 0.5 * total) AS wp50
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** RawSql chart variant (reference RawSqlChartConfigSchema + replaceMacros
    * macros.ts:288-369): a user SQL template with `$__sourceTable`,
    * `$__timeFilter`, `$__timeInterval`, and `$__filters` macros bound to a
    * dashboard range/granularity/filter set, run via spark.sql. */
  def q43_rawsql(spark: SparkSession, dir: String): DataFrame = {
    import graft.compile.RawSql
    val cfg = RawSql.Config(
      sqlTemplate = """SELECT $__timeInterval(ts) AS b, count(*) AS cnt,
                      |  round(sum(value), 2) AS sum_v
                      |FROM $__sourceTable
                      |WHERE $__timeFilter(ts) AND $__filters
                      |GROUP BY 1 ORDER BY 1""".stripMargin,
      from = Some("events"),
      dateRange = Some((java.time.Instant.parse("2024-01-01T00:00:00Z"),
        java.time.Instant.parse("2024-02-01T00:00:00Z"))),
      stepSeconds = Some(86400),
      filtersSql = Some("event_type IN ('error', 'click')"))
    RawSql.run(spark, cfg, cat(spark, dir))
      .withColumn("bucket", unix_timestamp(col("b")))
      .select("bucket", "cnt", "sum_v")
      .orderBy("bucket")
  }

  val q43_sql: String =
    """SELECT CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS bucket,
      |  count(*) AS cnt, round(sum(value), 2) AS sum_v
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
      |  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
      |  AND event_type IN ('error', 'click')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Session-replay timeline over the `sessions` source (the last unbound
    * SourceKind — reference hyperdx_sessions,
    * docker/otel-collector/schema/seed/00004_hyperdx_sessions.sql:1-30, and
    * the sessions list query shape, packages/app/src/sessions.ts:100-175):
    * rrweb event counts per session per hour through the generic log
    * path — lucene existence on the map-resident `rum.sessionId` (via
    * field alias), conditional counts on a LogAttributes exact match, a
    * severity contains-match, and a JSON dot-path into the rrweb Body. */
  def q55_sessions(spark: SparkSession, dir: String): DataFrame =
    epochBucket(compiled(Query(
      select = Seq(
        SelectItem("", Some("cnt"), Some(AggFn.Count)),
        SelectItem("", Some("interactions"), Some(AggFn.Count),
          Some(Cond.Lucene("component:\"user-interaction\""))),
        SelectItem("", Some("errors"), Some(AggFn.Count),
          Some(Cond.Lucene("level:error"))),
        SelectItem("", Some("snapshots"), Some(AggFn.Count),
          Some(Cond.Lucene("Body.type:2")))),
      from = "sessions",
      where = Some(Cond.Lucene("session_id:*")),
      groupBy = Seq("ResourceAttributes['rum.sessionId']"),
      granularity = Some(Granularity.Fixed(3600)),
      dateRange = Some(JanRange)))(spark, dir))
      .withColumnRenamed("ResourceAttributes['rum.sessionId']",
        "session_id")
      .select("bucket", "session_id", "cnt", "interactions", "errors",
        "snapshots")
      .orderBy("bucket", "session_id")

  val q55_sql: String =
    """SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS bucket,
      |  'sess-' || CAST(user_id AS VARCHAR) AS session_id,
      |  count(*) AS cnt,
      |  count(*) FILTER (WHERE event_type IN ('click', 'purchase'))
      |    AS interactions,
      |  count(*) FILTER (WHERE event_type = 'error') AS errors,
      |  count(*) FILTER (WHERE event_type = 'view') AS snapshots
      |FROM events
      |WHERE ts >= '2024-01-01T00:00:00Z' AND ts <= '2024-03-01T00:00:00Z'
      |GROUP BY bucket, session_id
      |ORDER BY bucket, session_id""".stripMargin

  // ============================================================== registry

  /** Compare-to-previous-period overlay at the driver gate: daily
    * per-type counts overlaid with the same series seven days earlier,
    * week-over-week ratio where a previous point exists — the chart
    * toggle as Series.compareWindow's one-pass union + single hash
    * aggregate (each point re-keyed to the bucket it informs; no
    * self-join). The oracle replays it as a plain SQL self-join —
    * a genuinely different formulation. */
  def q118_compare_window(spark: SparkSession, dir: String): DataFrame = {
    val e = cat(spark, dir)("events").df
    val daily = e.groupBy(
        (floor(unix_timestamp(col("ts")) / 86400) * 86400).cast("long")
          .as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("value"))
    graft.compile.Series
      .compareWindow(daily, "bucket", "value", 7 * 86400L,
        Seq("event_type"))
      .withColumn("wow", when(col("prev_value") > 0,
        round(col("value") / col("prev_value"), 6)))
      .orderBy("bucket", "event_type")
  }

  val q118_sql: String =
    """WITH d AS (
      |  SELECT CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS bucket,
      |    event_type, count(*) AS value
      |  FROM events GROUP BY 1, 2)
      |SELECT d.bucket, d.event_type, d.value, p.value AS prev_value,
      |  CASE WHEN p.value > 0
      |    THEN round(d.value * 1.0 / p.value, 6) END AS wow
      |FROM d LEFT JOIN d p
      |  ON p.bucket = d.bucket - 604800 AND p.event_type = d.event_type
      |ORDER BY d.bucket, d.event_type""".stripMargin

  /** Round-7 Lucene semantics at the driver gate — the reference-parity
    * behaviors LuceneBatterySpec pins, driven through the FULL
    * compile+oracle path: in-group EDGE-ANCHORED wildcards
    * (`event_type:(vi* OR *up)` = starts-with 'vi' OR ends-with 'up' —
    * a contains reading would also admit 'view'⊃'vi'… identical here,
    * but 'click'/'error'/'purchase' discriminate the OR), a NEGATED
    * JSON dot-path with the ClickHouse '' default (missing path reads
    * as empty string, so negation can never null-poison the AND), and
    * a missing-key existence check (`NOT props.zz:*` is TRUE when the
    * key is absent — the KV missing-key semantics). The oracle restates
    * each as explicit LIKE/json_extract SQL. */
  def q119_lucene_semantics(spark: SparkSession, dir: String): DataFrame =
    compiled(Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "events",
      where = Some(Cond.Lucene(
        "event_type:(vi* OR *up) -props.k:4* NOT props.zz:*")),
      groupBy = Seq("event_type"),
      orderBy = Seq(OrderBy("event_type"))))(spark, dir)

  val q119_sql: String =
    """SELECT event_type, count(*) AS cnt FROM events
      |WHERE (lower(event_type) LIKE 'vi%' OR lower(event_type) LIKE '%up')
      |  AND NOT (lower(coalesce(json_extract_string(props,'$.k'), ''))
      |           LIKE '%4%')
      |  AND NOT (coalesce(json_extract_string(props,'$.zz'), '') <> '')
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1_agg _),
    "q2_filter" -> (q2_filter _),
    "q3_join" -> (q3_join _),
    "q4_timeseries" -> (q4_timeseries _),
    "q5_lucene" -> (q5_lucene _),
    "q6_json" -> (q6_json _),
    "q7_conditional" -> (q7_conditional _),
    "q8_quantile" -> (q8_quantile _),
    "q9_count_distinct" -> (q9_count_distinct _),
    "q10_having" -> (q10_having _),
    "q11_series_limit" -> (q11_series_limit _),
    "q12_ratio" -> (q12_ratio _),
    "q36_string_coercion" -> (q36_string_coercion _),
    "q39_weighted" -> (q39_weighted _),
    "q43_rawsql" -> (q43_rawsql _),
    "q49_lucene_url" -> (q49_lucene_url _),
    "q54_buildersql" -> (q54_buildersql _),
    "q118_compare_window" -> (q118_compare_window _),
    "q119_lucene_semantics" -> (q119_lucene_semantics _),
    "q55_sessions" -> (q55_sessions _))

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1_sql,
    "q2_filter" -> q2_sql,
    "q3_join" -> q3_sql,
    "q4_timeseries" -> q4_sql,
    "q5_lucene" -> q5_sql,
    "q6_json" -> q6_sql,
    "q7_conditional" -> q7_sql,
    "q8_quantile" -> q8_sql,
    "q9_count_distinct" -> q9_sql,
    "q10_having" -> q10_sql,
    "q11_series_limit" -> q11_sql,
    "q12_ratio" -> q12_sql,
    "q36_string_coercion" -> q36_sql,
    "q39_weighted" -> q39_sql,
    "q43_rawsql" -> q43_sql,
    "q49_lucene_url" -> q49_sql,
    "q54_buildersql" -> q54_sql,
    "q118_compare_window" -> q118_sql,
    "q119_lucene_semantics" -> q119_sql,
    "q55_sessions" -> q55_sql)
}
