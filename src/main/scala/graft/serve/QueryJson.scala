package graft.serve

import java.time.Instant

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.ir._

/** JSON ⇄ [[graft.ir.Query]] codec — the wire shape of the reference's
  * `ChartConfig` (packages/common-utils/src/types.ts:1269-1383) restated
  * over the engine's IR, so a dashboard can POST the same structure it
  * persists. Uses the Jackson tree API (bundled with Spark — no new
  * dependency) and fails loudly with field-specific messages: a malformed
  * config is a 400, never a silently-empty query. */
object QueryJson {

  private val mapper = new ObjectMapper()

  def parseQuery(body: String): Query = {
    val root = mapper.readTree(body)
    require(root != null && root.isObject, "body must be a JSON object")
    queryFrom(root)
  }

  private def queryFrom(n: JsonNode): Query = {
    val from = reqText(n, "from")
    val select = opt(n, "select") match {
      case None => throw bad("select is required")
      case Some(s) =>
        require(s.isArray && s.size > 0, "select must be a non-empty array")
        s.elements().asScala.map(selectItem).toSeq
    }
    Query(
      select = select,
      from = from,
      where = opt(n, "where").map(cond),
      filters = opt(n, "filters").toSeq.flatMap { f =>
        require(f.isArray, "filters must be an array")
        f.elements().asScala.map(filter).toSeq
      },
      filtersOr = opt(n, "filtersLogicalOperator")
        .exists(_.asText("AND").equalsIgnoreCase("OR")),
      groupBy = strings(n, "groupBy"),
      having = opt(n, "having").map(cond),
      orderBy = opt(n, "orderBy").toSeq.flatMap { o =>
        require(o.isArray, "orderBy must be an array")
        o.elements().asScala.map { e =>
          OrderBy(reqText(e, "expression"),
            opt(e, "desc").exists(_.asBoolean(false)))
        }.toSeq
      },
      limit = opt(n, "limit").map(num(_, "limit").asInt),
      offset = opt(n, "offset").map(num(_, "offset").asInt),
      granularity = opt(n, "granularity").map { g =>
        if (g.isNumber) Granularity.Fixed(g.asLong)
        else if (g.asText == "auto") Granularity.Auto
        else throw bad(s"granularity must be seconds or 'auto', " +
          s"got ${g.asText}")
      },
      dateRange = opt(n, "dateRange").map { d =>
        val raw = DateRange(Instant.parse(reqText(d, "from")),
          Instant.parse(reqText(d, "to")),
          opt(d, "inclusiveEnd").forall(_.asBoolean(true)))
        // "align": true snaps the range to granularity boundaries
        // (floor start, ceil end — the reference's getAlignedDateRange)
        // so edge buckets cover full windows; requires a fixed
        // granularity to align against
        if (opt(d, "align").exists(_.asBoolean(false))) {
          val step = opt(n, "granularity") match {
            case Some(g) if g.isNumber => g.asLong
            case _ => throw bad(
              "dateRange.align requires a numeric 'granularity'")
          }
          val (f, t) = graft.functions.CoreFunctions
            .alignDateRange(raw.from, raw.to, step)
          // the ceiled end is a BUCKET BOUNDARY: keeping it inclusive
          // would admit rows at exactly t into a spurious extra bucket —
          // the partial-edge artifact align exists to remove
          raw.copy(from = f, to = t, inclusiveEnd = false)
        } else raw
      },
      seriesLimit = opt(n, "seriesLimit").map(num(_, "seriesLimit").asInt),
      ctes = opt(n, "ctes").toSeq.flatMap { c =>
        require(c.isObject, "ctes must be an object of name -> query")
        c.properties().asScala.map(e => e.getKey -> queryFrom(e.getValue))
          .toSeq
      })
  }

  private def selectItem(n: JsonNode): SelectItem = SelectItem(
    valueExpression = reqText(n, "valueExpression"),
    alias = opt(n, "alias").map(_.asText),
    aggFn = opt(n, "aggFn").map(a => aggFn(a.asText,
      opt(n, "level").map(num(_, "level").asDouble))),
    aggCondition = opt(n, "aggCondition").map(cond))

  /** Names mirror the reference's AggregateFunctionSchema
    * (types.ts:161-183). */
  private def aggFn(name: String, level: Option[Double]): AggFn =
    name match {
      case "count" => AggFn.Count
      case "count_distinct" => AggFn.CountDistinct
      case "avg" => AggFn.Avg
      case "min" => AggFn.Min
      case "max" => AggFn.Max
      case "sum" => AggFn.Sum
      case "any" => AggFn.AnyValue
      case "last_value" => AggFn.LastValue
      case "none" => AggFn.NoAgg
      case "increase" => AggFn.Increase
      case "quantile" => AggFn.Quantile(level.getOrElse(
        throw bad("quantile requires a 'level'")))
      case other => throw bad(s"unknown aggFn '$other'")
    }

  private def cond(n: JsonNode): Cond =
    (opt(n, "lucene"), opt(n, "sql")) match {
      case (Some(l), None) => Cond.Lucene(l.asText)
      case (None, Some(s)) => Cond.Sql(s.asText)
      case _ => throw bad("condition needs exactly one of 'lucene'/'sql'")
    }

  private def filter(n: JsonNode): Filter =
    opt(n, "type").map(_.asText).getOrElse("cond") match {
      case "cond" => Filter.CondFilter(cond(n))
      case "sql_ast" => Filter.SqlAst(reqText(n, "operator"),
        reqText(n, "left"), reqText(n, "right"))
      case "included" =>
        Filter.Included(reqText(n, "field"), strings(n, "values"))
      case "excluded" =>
        Filter.Excluded(reqText(n, "field"), strings(n, "values"))
      case "range" => Filter.NumRange(reqText(n, "field"),
        num(req(n, "lo"), "lo").asDouble, num(req(n, "hi"), "hi").asDouble)
      case other => throw bad(s"unknown filter type '$other'")
    }

  // ------------------------------------------------------------- helpers

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull)

  private def req(n: JsonNode, field: String): JsonNode =
    opt(n, field).getOrElse(throw bad(s"missing required field '$field'"))

  private def reqText(n: JsonNode, field: String): String = {
    val v = req(n, field)
    require(v.isTextual, s"'$field' must be a string")
    v.asText
  }

  /** Jackson's asInt/asDouble coerce non-numbers to 0 — a "limit":
    * "abc" would silently become limit 0 (an empty result) without this
    * guard, breaking the fail-loudly contract. */
  private def num(v: JsonNode, field: String): JsonNode = {
    require(v.isNumber, s"'$field' must be a number")
    v
  }

  /** Like [[num]], element-level: Jackson's asText coerces an
    * object/array element to "" — a malformed groupBy entry would
    * silently become an empty-string column instead of a 400. */
  private def strings(n: JsonNode, field: String): Seq[String] =
    opt(n, field).toSeq.flatMap { v =>
      require(v.isArray, s"'$field' must be an array of strings")
      v.elements().asScala.map { e =>
        require(e.isTextual, s"'$field' elements must be strings")
        e.asText
      }.toSeq
    }

  private def bad(msg: String): IllegalArgumentException =
    new IllegalArgumentException(msg)
}
