package graft.serve

import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CoreFunctions.TimeBucketAlias
import graft.metrics.PromQl

/** The Prometheus HTTP API v1 face of the PromQL engine — the endpoints
  * the reference serves at /api/v1 (packages/api/src/routers/api/
  * prometheus.ts: query_range :322-456, query :462-570,
  * label/:name/values :722-824), re-expressed over [[PromQl.eval]].
  * [[Server]] mounts these under both the /promql and /api/v1
  * prefixes — the latter is the one a stock Grafana Prometheus datasource
  * hardcodes, and scalar-only instant queries fold driver-side
  * (Grafana health-checks with `query=1+1` on datasource save), so
  * Grafana can point at [[Server]] directly.
  * Response shapes follow the Prometheus API: `{"status":"success",
  * "data":{"resultType":"matrix"|"vector","result":[...]}}` with
  * `[unixSeconds, "value"]` sample pairs, `{"status":"error",
  * "errorType":"bad_data","error":...}` on 400s, and a `warnings`
  * array when the row cap truncates the result (Prometheus has no
  * truncation field; warnings is its documented side channel).
  *
  * Documented divergences from a native Prometheus:
  *  - eval points are EPOCH-aligned to `step` (floor(t/step)·step),
  *    not `start`-aligned — the engine's chart-bucket convention; a
  *    Grafana panel sees identical series, shifted ≤ step.
  *  - a bare selector aggregates across series (the engine's chart
  *    semantics — [[PromQl]] compiles it as a cross-series gauge);
  *    write `sum by (lbl) (m)` / `max by (...)` to keep labels, which
  *    is what dashboards do anyway.
  *  - instant /query evaluates the window [time − step, time] (default
  *    step = Prometheus's 5m lookback window) and answers with the
  *    newest bucket that has data — Prometheus's "newest sample ≤ t"
  *    lookback, at bucket granularity. Evaluating only the bucket
  *    *containing* `time` would starve a boundary-aligned `time` to
  *    zero rows, because the scan is capped at `TimeUnix <= time`.
  */
object PromApi {

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Prometheus time param: unix seconds (possibly fractional) or
    * RFC3339. */
  def parseTime(s: String, field: String): Instant =
    try {
      if (s.matches("-?[0-9]+(\\.[0-9]+)?"))
        Instant.ofEpochMilli(math.round(s.toDouble * 1000.0))
      else Instant.parse(s)
    } catch {
      case _: RuntimeException =>
        bad(s"invalid $field timestamp: '$s'")
    }

  /** Prometheus step/duration param: bare seconds or a Prometheus
    * duration — one or more `<n><unit>` groups with unit ∈
    * ms/s/m/h/d/w/y, so compound spellings like `1h30m` or `1m30s`
    * parse (the Prometheus duration grammar allows them). Sub-second
    * totals clamp to 1 s (the engine's bucket grain). */
  def parseStep(s: String): Long = {
    val t = s.trim
    val Dur = "([0-9]+)(ms|s|m|h|d|w|y)".r
    val secs =
      if (t.matches("(?:[0-9]+(?:ms|s|m|h|d|w|y))+")) {
        val totalMs = Dur.findAllMatchIn(t).map { m =>
          val unitMs = m.group(2) match {
            case "ms" => 1L
            case "s" => 1000L
            case "m" => 60000L
            case "h" => 3600000L
            case "d" => 86400000L
            case "w" => 604800000L
            case "y" => 31536000000L
          }
          m.group(1).toLong * unitMs
        }.sum
        if (totalMs <= 0) bad(s"step must be positive: '$s'")
        math.max(1L, totalMs / 1000)
      } else if (t.matches("[0-9]+(\\.[0-9]+)?"))
        math.max(1L, t.toDouble.toLong)
      else bad(s"invalid step: '$t'")
    if (secs <= 0) bad(s"step must be positive: '$s'") else secs
  }

  /** GET/POST /promql/query_range → matrix JSON. The metric frame is
    * pre-filtered to [start − lookback − step, end] so the scan prunes
    * before any series math, then eval buckets are sliced back to the
    * requested window. */
  def queryRange(df: DataFrame, query: String, start: Instant,
      end: Instant, step: Long, maxRows: Int): String = {
    if (end.isBefore(start)) bad("end must be >= start")
    if (step <= 0) bad("step must be positive")
    // scalar-only range queries answer a single label-less matrix
    // series, the expression folded at each epoch-aligned step (only
    // time() makes consecutive points differ). The grid starts at
    // floor(start/step)·step — the SAME first bucket the vector path's
    // startFloor slice admits, so mixed panels share a grid — the AST
    // parses once, and the point count honors the maxRows cap the
    // vector path enforces (an uncapped 1-second step over years would
    // otherwise build a multi-GB string driver-side).
    val ast = try Some(PromQl.parse(query)) catch {
      case _: PromQl.PromQlParseException => None
    }
    val scalarProbe = ast.flatMap(a =>
      PromQl.constScalarAst(a, start.getEpochSecond))
    if (scalarProbe.isDefined) {
      val t0 = math.floorDiv(start.getEpochSecond, step) * step
      val all = (end.getEpochSecond - t0) / step + 1
      val truncated = all > maxRows
      val n = math.min(all, maxRows.toLong)
      val pts = (0L until n).map { i =>
        val t = t0 + i * step
        s"[$t,${QueryJsonOut.quote(fmt(
          PromQl.constScalarAst(ast.get, t).get))}]"
      }
      val warn = if (truncated)
        s""","warnings":[${QueryJsonOut.quote(
          s"result truncated at $maxRows points")}]"""
      else ""
      // warnings sits OUTSIDE data — the resultJson / Prometheus shape
      return s"""{"status":"success","data":{"resultType":"matrix",""" +
        s""""result":[{"metric":{},"values":[${pts.mkString(",")}]}]}$warn}"""
    }
    val sliced = rangeFrame(df, query, start, end, step)
    val (series, truncated) = collectSeries(sliced, maxRows)
    matrixJson(series, truncated, maxRows)
  }

  /** GET/POST /promql/query → vector JSON: evaluates [time − step,
    * time] (step defaults to the 5m lookback) and takes each series'
    * newest bucket, one sample per series stamped at the requested
    * time like Prometheus instant queries ("newest sample ≤ t"). The
    * lookback keeps a boundary-aligned `time` from starving its own
    * bucket — the scan cap `TimeUnix <= time` admits no rows from
    * [time, time + step) — while `points.last` still prefers the
    * newer bucket whenever a mid-bucket `time` has data after the
    * boundary. */
  def instantQuery(df: DataFrame, query: String, time: Instant,
      step: Long = 300L, maxRows: Int): String = {
    // scalar-only expressions (Grafana health-checks with `1+1` on
    // datasource save) fold driver-side to the Prometheus scalar shape
    PromQl.constScalar(query, time.getEpochSecond).foreach { v =>
      return s"""{"status":"success","data":{"resultType":"scalar",""" +
        s""""result":[${time.getEpochSecond},${QueryJsonOut.quote(fmt(v))}]}}"""
    }
    val sliced = rangeFrame(df, query, time.minusSeconds(step), time, step)
    val (series, truncated) = collectSeries(sliced, maxRows)
    val items = series.map { case (labels, points) =>
      val (_, v) = points.last
      s"""{"metric":${labelsJson(labels)},"value":[${time.getEpochSecond},${QueryJsonOut.quote(fmt(v))}]}"""
    }
    resultJson("vector", items, truncated, maxRows)
  }

  private def rangeFrame(df: DataFrame, query: String, start: Instant,
      end: Instant, step: Long): DataFrame = {
    if (step <= 0) bad("step must be positive")
    val look = PromQl.maxLookback(query)
    val from = java.sql.Timestamp.from(start.minusSeconds(look + step))
    val to = java.sql.Timestamp.from(end)
    val filtered = df.filter(col("TimeUnix") >= lit(from) &&
      col("TimeUnix") <= lit(to))
    val out = PromQl.eval(filtered, query, step)
    val startFloor = java.sql.Timestamp.from(Instant.ofEpochSecond(
      math.floorDiv(start.getEpochSecond, step) * step))
    out.filter(col(TimeBucketAlias) >= lit(startFloor) &&
      col(TimeBucketAlias) <= lit(to))
  }

  /** Collect ≤ maxRows+1 points ordered by (labels, t) and group into
    * series; the extra row is the truncation sentinel (surfaced as a
    * Prometheus `warnings` entry, the API's side channel). */
  private def collectSeries(sliced: DataFrame, maxRows: Int)
      : (Seq[(Seq[(String, String)], Seq[(Long, Double)])], Boolean) = {
    val labelCols = sliced.columns.toSeq
      .filterNot(c => c == TimeBucketAlias || c == "value")
    val ordered = sliced
      .filter(col("value").isNotNull)
      .select((unix_timestamp(col(TimeBucketAlias)).as("__t") +:
        col("value").cast("double").as("__v") +:
        labelCols.map(c => col(c).cast("string").as(c))): _*)
      .orderBy((labelCols.map(col) :+ col("__t")): _*)
    val rows = ordered.limit(maxRows + 1).collect()
    val truncated = rows.length > maxRows
    val kept = if (truncated) rows.take(maxRows) else rows
    val grouped = kept.foldLeft(
      Vector.empty[(Seq[(String, String)], Vector[(Long, Double)])]) {
      (acc, r) =>
        val labels = labelCols.zipWithIndex.flatMap { case (c, i) =>
          Option(r.getString(2 + i)).map(c -> _)
        }
        val pt = (r.getLong(0), r.getDouble(1))
        acc.lastOption match {
          case Some((l, pts)) if l == labels =>
            acc.init :+ (l, pts :+ pt)
          case _ => acc :+ (labels, Vector(pt))
        }
    }
    (grouped.map { case (l, p) => (l, p: Seq[(Long, Double)]) }, truncated)
  }

  private def matrixJson(
      series: Seq[(Seq[(String, String)], Seq[(Long, Double)])],
      truncated: Boolean, maxRows: Int): String = {
    val items = series.map { case (labels, points) =>
      val vals = points.map { case (t, v) =>
        s"[$t,${QueryJsonOut.quote(fmt(v))}]"
      }.mkString(",")
      s"""{"metric":${labelsJson(labels)},"values":[$vals]}"""
    }
    resultJson("matrix", items, truncated, maxRows)
  }

  private def resultJson(resultType: String, items: Seq[String],
      truncated: Boolean, maxRows: Int): String = {
    val warn = if (truncated)
      s""","warnings":[${QueryJsonOut.quote(
        s"result truncated at $maxRows points")}]"""
    else ""
    s"""{"status":"success","data":{"resultType":"$resultType",""" +
      s""""result":[${items.mkString(",")}]}$warn}"""
  }

  private def labelsJson(labels: Seq[(String, String)]): String =
    labels.map { case (k, v) =>
      s"${QueryJsonOut.quote(k)}:${QueryJsonOut.quote(v)}"
    }.mkString("{", ",", "}")

  /** `/promql/series` body: `data` is a bare array of label-set
    * objects (no resultType wrapper — the Prometheus /api/v1/series
    * shape), `__name__` leading each set. Truncation surfaces as a
    * `warnings` entry like the query endpoints. */
  def seriesJson(sets: Seq[Seq[(String, String)]], truncated: Boolean,
      maxSeries: Int): String = {
    val items = sets.map { labels =>
      val renamed = labels.map {
        case ("MetricName", v) => ("__name__", v)
        case kv => kv
      }
      val (name, rest) = renamed.partition(_._1 == "__name__")
      labelsJson(name ++ rest.sortBy(_._1))
    }
    val warn = if (truncated)
      s""","warnings":[${QueryJsonOut.quote(
        s"result truncated at $maxSeries series")}]"""
    else ""
    s"""{"status":"success","data":[${items.mkString(",")}]$warn}"""
  }

  /** Sample values are strings in the Prometheus wire shape; integers
    * print without a decimal point and infinities spell `+Inf`/`-Inf`
    * the way Prometheus formats them (strict clients reject
    * `Infinity`). */
  private[serve] def fmt(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v == Double.PositiveInfinity) "+Inf"
    else if (v == Double.NegativeInfinity) "-Inf"
    else if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** The Prometheus label-name grammar — the reference validates the
    * path segment against it before use (prometheus.ts:719). */
  val LabelName = "^[a-zA-Z_:][a-zA-Z0-9_:]*$".r

  /** Prometheus error body (400 family): `errorType: bad_data` like
    * the reference's handlers. */
  def errorJson(msg: String): String =
    s"""{"status":"error","errorType":"bad_data",""" +
      s""""error":${QueryJsonOut.quote(msg)}}"""
}
