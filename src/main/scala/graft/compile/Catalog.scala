package graft.compile

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A typed view over one table — the analogue of the reference's `Source`
  * (packages/common-utils/src/types.ts:1813-1932): a DataFrame plus the
  * semantic column bindings the compiler needs. */
final case class Source(
    df: DataFrame,
    /** timestamp column for dateRange filters / time bucketing. */
    timestampColumn: Option[String] = None,
    /** implicit columns searched by free-text lucene terms; several are
      * combined with concat_ws(";", …) like the reference's multi-column
      * implicit field (queryParser.ts:1873-1934). */
    implicitColumns: Seq[String] = Nil,
    /** body columns — the fallback when no implicit column is configured
      * (reference getColumnForField's chain `implicitColumnExpression ||
      * bodyExpression`, queryParser.ts:1873-1896): an admin who sets only
      * the Body Expression can still run bare-text search. */
    bodyColumns: Seq[String] = Nil,
    /** string columns holding JSON documents — dot-paths descend into them. */
    jsonStringColumns: Set[String] = Set.empty,
    /** semantic field aliases (e.g. "service" → "ServiceName"). */
    fieldAliases: Map[String, String] = Map.empty,
    /** sample-weight expression (e.g. trace SampleRate): when set, count/
      * sum/avg/quantile become weighted (reference types.ts:1986-1992,
      * renderChartConfig.ts:556-624). */
    sampleWeightExpression: Option[String] = None,
    /** materialized-column substitution (reference fastifySQL,
      * renderChartConfig.ts:209-341): logical field path → physical column
      * that materializes it; the resolver prefers the physical column. */
    materializedColumns: Map[String, String] = Map.empty,
    /** date-typed partition column derived from the timestamp: when set,
      * dateRange filters also emit a predicate on it so Catalyst prunes
      * partitions/files (reference timestamp-expression optimization,
      * utils.ts:1012-1041; SURVEY §4). */
    partitionDateColumn: Option[String] = None) {

  /** The column bare-text lucene terms search: implicit columns first,
    * body columns as the fallback (the reference's resolution chain,
    * queryParser.ts:1873-1896); several columns concat with ';'. A
    * per-query override is the caller constructing LuceneContext with
    * its own column — that path never multi-column-concats, mirroring
    * the reference's isSourceImplicit guard. None → free-text terms
    * raise (the reference throws 'Can not search bare text…'). */
  def implicitSearchColumn: Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, concat_ws}
    def combine(cols: Seq[String]) = cols match {
      case Nil => None
      case Seq(one) => Some(col(one))
      case many => Some(concat_ws(";", many.map(col): _*))
    }
    combine(implicitColumns).orElse(combine(bodyColumns))
  }
}

/** Named sources the compiler can reference from `Query.from`. */
final class Catalog(val sources: Map[String, Source]) {
  def apply(name: String): Source = sources.getOrElse(name,
    throw new IllegalArgumentException(s"unknown source: $name"))
  def withSource(name: String, s: Source): Catalog =
    new Catalog(sources + (name -> s))
}

object Catalog {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Split a comma-separated column-expression list at DEPTH ZERO only —
    * commas inside parentheses, square brackets, or quoted strings
    * (single/double, with backslash-escaped or SQL-doubled quotes) do
    * not split (the reference's `splitAndTrimWithBracket`,
    * core/utils.ts; tested utils.test.ts:121-293). This is how a
    * config string like `"Body, concat(a, ', ', b)"` becomes
    * `Source.implicitColumns`/`bodyColumns` without shredding the
    * function call. Elements are trimmed; empties dropped. */
  def splitColumnsExpression(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) {
        if (c == '\\' && i + 1 < s.length) {
          sb += c; sb += s(i + 1); i += 1 // escape consumes the pair
        } else if (c == quote) {
          sb += c
          if (i + 1 < s.length && s(i + 1) == quote) {
            sb += s(i + 1); i += 1 // SQL-doubled quote stays inside
          } else quote = 0
        } else sb += c
      } else c match {
        case '\'' | '"' => quote = c; sb += c
        case '(' | '[' => depth += 1; sb += c
        case ')' | ']' => depth = math.max(0, depth - 1); sb += c
        case ',' if depth == 0 => out += sb.result().trim; sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    out += sb.result().trim
    out.filter(_.nonEmpty).toSeq
  }

  /** Resolve a (possibly multi-column) timestamp expression like
    * `"EventDate, EventTime"` into Source bindings: the BUCKET column is
    * the first timestamp-typed token — never a Date, whose day
    * granularity would collapse sub-daily buckets (the reference's
    * pickBucketTimestampColumn, core/utils.ts:192-266 / HDX-4371) —
    * and the first Date-typed token becomes the partition-pruning
    * column (`Source.partitionDateColumn`), so dateRange filters hit
    * both. Falls back to the first token when no timestamp-typed
    * column resolves, like the reference. */
  def timestampBindings(expression: String,
      schema: org.apache.spark.sql.types.StructType)
      : (Option[String], Option[String]) = {
    import org.apache.spark.sql.types._
    val tokens = splitColumnsExpression(expression)
    if (tokens.isEmpty) return (None, None)
    def typeOf(t: String): Option[DataType] =
      schema.fields.find(_.name.equalsIgnoreCase(t)).map(_.dataType)
    val ts = tokens.find(t => typeOf(t).exists {
      case TimestampType | TimestampNTZType => true
      case _ => false
    })
    val date = tokens.find(t => typeOf(t).contains(DateType))
    (ts.orElse(Some(tokens.head)), date)
  }

  /** Session-replay source (reference hyperdx_sessions,
    * docker/otel-collector/schema/seed/00004_hyperdx_sessions.sql:1-30):
    * log-shaped rows whose Body holds the serialized rrweb event and whose
    * ResourceAttributes carry `rum.sessionId`. The testdata has no
    * sessions parquet, so the frame derives deterministically from events
    * — one rrweb event per row, one session per user:
    * view → FullSnapshot (2), click/purchase → IncrementalSnapshot (3),
    * signup → Meta (4), error → Custom (5), and errors are
    * SeverityText=error like the SDK's exception events. */
  private[compile] def sessionsFrame(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val rrwebType = when(col("event_type") === "view", 2)
      .when(col("event_type").isin("click", "purchase"), 3)
      .when(col("event_type") === "signup", 4)
      .otherwise(5)
    events.select(
      col("ts").as("Timestamp"),
      md5(concat(lit("tr-"), col("event_id").cast("string"))).as("TraceId"),
      md5(concat(lit("sp-"), col("event_id").cast("string"))).as("SpanId"),
      when(col("event_type") === "error", "error").otherwise("info")
        .as("SeverityText"),
      when(col("event_type") === "error", 17).otherwise(9)
        .as("SeverityNumber"),
      col("event_type").as("ServiceName"),
      concat(lit("""{"type":"""), rrwebType.cast("string"),
        lit(""","data":{"source":"""),
        (col("event_id") % 10).cast("string"),
        lit("}}")).as("Body"),
      map(lit("rum.sessionId"),
        concat(lit("sess-"), col("user_id").cast("string")))
        .as("ResourceAttributes"),
      map().cast("map<string,string>").as("ScopeAttributes"),
      map(lit("component"),
        when(col("event_type").isin("click", "purchase"),
          "user-interaction").otherwise("ui")).as("LogAttributes"))
  }

  /** Standing OTel-gauge-shaped metric catalog (MetricName / ServiceName
    * / TimeUnix / Value / Attributes — FIXTURES §3, the reference's
    * otel_metrics_gauge seed DDL): the view the serving layer's label
    * introspection ([[graft.meta.Metadata.timeSeriesTags]], `/labels`)
    * and PromQL autocomplete address. The testdata has no metric
    * parquet, so the frame derives deterministically from events the
    * same way the per-query metric pipelines (MetricQueries) derive
    * theirs inline. */
  private[compile] def metricsFrame(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    events.select(
      lit("value").as("MetricName"),
      col("event_type").as("ServiceName"),
      col("ts").as("TimeUnix"),
      col("value").as("Value"),
      map(lit("user"), col("user_id").cast("string")).as("Attributes"))
  }

  /** Load the driver testdata directory as a catalog, with semantic bindings
    * for the observability-shaped tables. */
  def forDir(spark: SparkSession, dir: String): Catalog = {
    // Some testdata generations write events.ts as Parquet TIMESTAMP(NANOS)
    // (no native Spark type — read as a ns long via the legacy flag), others
    // as TIMESTAMP(MICROS) isAdjustedToUTC=false (read as TIMESTAMP_NTZ).
    // Normalize both to the same two columns: `ts` TimestampType (session
    // tz is UTC, so NTZ wall time == the instant) and `ts_ns` raw ns long
    // (SURVEY §1.3 fidelity note).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ClickHouse-style permissive coercion (toFloat64OrDefault etc.): a
    // malformed value yields NULL/default, never a query error. Spark 4's
    // ANSI default would instead fail the whole query on one bad cast.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // Parquet isAdjustedToUTC=false surfaces as TIMESTAMP_NTZ; the engine
    // (and every oracle comparison) works in instants with a UTC session,
    // so cast NTZ columns to plain TimestampType — same wall time, and
    // binops against compiler-produced timestamp literals stay well-typed.
    def read(name: String): DataFrame = {
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
          f.name
      }.foldLeft(raw)((d, c) => d.withColumn(c,
        org.apache.spark.sql.functions.col(c).cast("timestamp")))
    }
    def readEvents: DataFrame = {
      import org.apache.spark.sql.functions.{col, expr}
      val raw = read("events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // Unit-robust: a raw int64 epoch column may be s/ms/µs/ns
          // depending on the writer. Decide per row by magnitude (the
          // bands are ~6 orders of magnitude apart — epoch seconds reach
          // ~2e9 while millis start ~1e12 — so misclassification would
          // need a date before 1971 or after 5000); normalize to ns.
          raw.withColumn("ts_ns", expr(
              """CASE WHEN ts > 100000000000000000L THEN ts
                |     WHEN ts > 100000000000000L THEN ts * 1000L
                |     WHEN ts > 100000000000L THEN ts * 1000000L
                |     ELSE ts * 1000000000L END""".stripMargin))
            .drop("ts")
            .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
            .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      }
    }
    // every timestamp binding routes through timestampBindings (the
    // pickBucketTimestampColumn port): a single-token expression
    // resolves to itself, a multi-column one (e.g. "EventDate,
    // EventTime") buckets on the timestamp token and prunes on the
    // Date token — one code path for both shapes
    def withTs(df: DataFrame, tsExpr: String,
        implicitCols: Seq[String] = Nil,
        jsonCols: Set[String] = Set.empty,
        aliases: Map[String, String] = Map.empty): Source = {
      val (ts, date) = timestampBindings(tsExpr, df.schema)
      Source(df, timestampColumn = ts, partitionDateColumn = date,
        implicitColumns = implicitCols, jsonStringColumns = jsonCols,
        fieldAliases = aliases)
    }
    val plain = TableNames.map(n => n -> Source(read(n))).toMap
    val tuned = plain ++ Map(
      "events" -> withTs(readEvents, "ts",
        implicitCols = Seq("event_type"),
        jsonCols = Set("props")),
      "documents" -> Source(read("documents"),
        implicitColumns = Seq("text")),
      "lineitem" -> withTs(read("lineitem"), "l_shipdate"),
      "orders" -> withTs(read("orders"), "o_orderdate"),
      "metrics" -> withTs(metricsFrame(readEvents), "TimeUnix"),
      "sessions" -> withTs(sessionsFrame(readEvents), "Timestamp",
        implicitCols = Seq("Body"),
        jsonCols = Set("Body"),
        aliases = Map(
          "session_id" -> "ResourceAttributes.rum.sessionId",
          "component" -> "LogAttributes.component",
          "level" -> "SeverityText")))
    new Catalog(tuned)
  }
}
