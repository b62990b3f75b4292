package graft.compile

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

/** RawSql chart variant: a user-supplied SQL template with `$__name(...)`
  * macros bound to the dashboard time range / granularity / filters
  * (reference RawSqlChartConfigSchema types.ts:1336-1356; macro table and
  * `replaceMacros` macros.ts:45-369). The reference expands macros to
  * ClickHouse SQL + query params; here they expand to Spark SQL text and the
  * template runs via spark.sql over the catalog's sources registered as
  * temp views — same trusted-expression model as the builder's `expr()`
  * strings (SURVEY §2.12). */
object RawSql {

  final case class Config(
      sqlTemplate: String,
      /** source name — expansion of `$__sourceTable` (reference `from`). */
      from: Option[String] = None,
      /** metric type → table name, for `$__sourceTable(metricType)`. */
      metricTables: Map[String, String] = Map.empty,
      /** bound time range for the time/date filter macros. */
      dateRange: Option[(Instant, Instant)] = None,
      /** granularity for `$__timeInterval`/`$__interval_s`. */
      stepSeconds: Option[Long] = None,
      /** expansion of `$__filters` (compiled dashboard filters). */
      filtersSql: Option[String] = None)

  final class MacroException(msg: String) extends Exception(msg)

  /** Valid `$__sourceTable(metricType)` arguments (reference
    * MetricsDataType types.ts:4-10). */
  val MetricTypes: Set[String] =
    Set("gauge", "histogram", "sum", "summary", "exponential histogram")

  private val NoFilters = "(1=1 /* no filters applied */)"

  // ------------------------------------------------------------ expansion

  def replaceMacros(cfg: Config): String = {
    def range: (Long, Long) = cfg.dateRange match {
      case Some((s, e)) => (s.toEpochMilli, e.toEpochMilli)
      case None => throw new MacroException(
        "time-range macro used without a dateRange")
    }
    def step: Long = cfg.stepSeconds.getOrElse(
      throw new MacroException("interval macro used without a granularity"))
    // second-precision bound (reference toDateTime(fromUnixTimestamp64Milli))
    def sec(ms: Long) = s"timestamp_seconds(${ms / 1000}L)"
    def ms(m: Long) = s"timestamp_millis(${m}L)"
    def date(m: Long) = s"to_date(timestamp_millis(${m}L))"

    def expand(name: String, args: Seq[String]): String = {
      def arity(n: Int): Unit = arityRange(n, n)
      def arityRange(lo: Int, hi: Int): Unit =
        if (args.length < lo || args.length > hi)
          throw new MacroException(
            s"Macro '$name' expects ${if (lo == hi) s"$lo" else s"$lo-$hi"}" +
              s" argument(s), but got ${args.length}")
      name match {
        case "fromTime" => arity(0); sec(range._1)
        case "toTime" => arity(0); sec(range._2)
        case "fromTime_ms" => arity(0); ms(range._1)
        case "toTime_ms" => arity(0); ms(range._2)
        case "timeFilter" => arity(1)
          val c = args.head
          s"$c >= ${sec(range._1)} AND $c <= ${sec(range._2)}"
        case "timeFilter_ms" => arity(1)
          val c = args.head
          s"$c >= ${ms(range._1)} AND $c <= ${ms(range._2)}"
        case "dateFilter" => arity(1)
          val c = args.head
          s"$c >= ${date(range._1)} AND $c <= ${date(range._2)}"
        case "dateTimeFilter" | "dt" => arity(2)
          val (d, t) = (args(0), args(1))
          s"($d >= ${date(range._1)} AND $d <= ${date(range._2)}) AND " +
            s"($t >= ${sec(range._1)} AND $t <= ${sec(range._2)})"
        case "timeInterval" => arity(1)
          // the engine's bucket form (CoreFunctions.timeBucket)
          s"timestamp_seconds(CAST(floor(unix_timestamp(${args.head}) / " +
            s"$step) AS BIGINT) * $step)"
        case "timeInterval_ms" => arity(1)
          val msStep = step * 1000
          s"timestamp_millis(CAST(floor(unix_millis(${args.head}) / " +
            s"$msStep) AS BIGINT) * $msStep)"
        case "interval_s" => arity(0); step.toString
        case "filters" => arity(0); cfg.filtersSql.getOrElse(NoFilters)
        case "sourceTable" => arityRange(0, 1)
          val from = cfg.from.getOrElse(throw new MacroException(
            "Macro '$__sourceTable' requires a source to be selected"))
          if (args.isEmpty) {
            if (cfg.metricTables.nonEmpty) throw new MacroException(
              "Macro '$__sourceTable(metricType)' requires a metricType " +
                "when a metrics source is selected")
            s"`$from`"
          } else {
            val t = args.head
            if (cfg.metricTables.isEmpty) throw new MacroException(
              "Macro '$__sourceTable(metricType)' with a metric type " +
                "argument requires a metrics source to be selected")
            if (!MetricTypes.contains(t)) throw new MacroException(
              s"Macro '$$__sourceTable(metricType)' invalid argument '$t'")
            cfg.metricTables.get(t).map(n => s"`$n`").getOrElse(
              throw new MacroException(
                s"No table configured for metric type '$t'"))
          }
        case other =>
          throw new MacroException(s"unknown macro '$$__$other'")
      }
    }

    // scan for $__name(args?) occurrences; names are maximal ident runs so
    // timeFilter_ms can't be misread as timeFilter (reference sorts by
    // length; maximal-munch achieves the same)
    val out = new StringBuilder
    val s = cfg.sqlTemplate
    var i = 0
    while (i < s.length) {
      if (s.startsWith("$__", i)) {
        val nameStart = i + 3
        var j = nameStart
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        val name = s.substring(nameStart, j)
        if (name.isEmpty)
          throw new MacroException(s"dangling '$$__' at offset $i")
        val (args, consumed) = parseArgs(s, j)
        out ++= expand(name, args)
        i = j + consumed
      } else { out += s(i); i += 1 }
    }
    out.toString
  }

  /** Parse `(a, b, …)` starting at `start` (balanced parens, top-level comma
    * split — reference parseMacroArgs/splitAndTrimWithBracket). Returns
    * (args, chars consumed); no paren → zero args. */
  private def parseArgs(s: String, start: Int): (Seq[String], Int) = {
    if (start >= s.length || s(start) != '(') return (Nil, 0)
    var depth = 0
    var i = start
    val args = Seq.newBuilder[String]
    val cur = new StringBuilder
    while (i < s.length) {
      val c = s(i)
      c match {
        case '(' =>
          depth += 1
          if (depth > 1) cur += c
        case ')' =>
          depth -= 1
          if (depth == 0) {
            val a = cur.toString.trim
            if (a.nonEmpty) args += a
            return (args.result(), i - start + 1)
          } else cur += c
        case ',' if depth == 1 =>
          args += cur.toString.trim
          cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    throw new MacroException("Failed to parse macro arguments")
  }

  // ------------------------------------------------------------ execution

  /** Expand and run the template: every catalog source becomes a temp view
    * named as in the catalog (CTE-style references just work). */
  def run(spark: SparkSession, cfg: Config, catalog: Catalog): DataFrame = {
    catalog.sources.foreach { case (name, src) =>
      src.df.createOrReplaceTempView(name)
    }
    spark.sql(replaceMacros(cfg))
  }
}
