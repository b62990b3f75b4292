package graft.compile

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A typed view over one table — the analogue of the reference's `Source`
  * (packages/common-utils/src/types.ts:1813-1932): a DataFrame plus the
  * semantic column bindings the compiler needs. */
final case class Source(
    df: DataFrame,
    /** timestamp column for dateRange filters / time bucketing. */
    timestampColumn: Option[String] = None,
    /** implicit (body) columns searched by free-text lucene terms; several
      * are combined with concat_ws(";", …) like the reference's multi-column
      * implicit field (queryParser.ts:1873-1934). */
    implicitColumns: Seq[String] = Nil,
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
    partitionDateColumn: Option[String] = None)

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

  /** Load the driver testdata directory as a catalog, with semantic bindings
    * for the observability-shaped tables. */
  def forDir(spark: SparkSession, dir: String): Catalog = {
    // testdata events.ts is Parquet TIMESTAMP(NANOS) which Spark has no
    // native type for; read it as a ns long and derive a µs TimestampType
    // column, keeping the raw ns in ts_ns (SURVEY §1.3 fidelity note).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ClickHouse-style permissive coercion (toFloat64OrDefault etc.): a
    // malformed value yields NULL/default, never a query error. Spark 4's
    // ANSI default would instead fail the whole query on one bad cast.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    def read(name: String): DataFrame =
      spark.read.parquet(s"$dir/$name.parquet")
    def readEvents: DataFrame =
      read("events")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts_ns DIV 1000)"))
    val plain = TableNames.map(n => n -> Source(read(n))).toMap
    val tuned = plain ++ Map(
      "events" -> Source(readEvents,
        timestampColumn = Some("ts"),
        implicitColumns = Seq("event_type"),
        jsonStringColumns = Set("props")),
      "documents" -> Source(read("documents"),
        implicitColumns = Seq("text")),
      "lineitem" -> Source(read("lineitem"),
        timestampColumn = Some("l_shipdate")),
      "orders" -> Source(read("orders"),
        timestampColumn = Some("o_orderdate")))
    new Catalog(tuned)
  }
}
