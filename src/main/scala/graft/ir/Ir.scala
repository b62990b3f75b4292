package graft.ir

import java.time.Instant

/** The query IR — the Scala analogue of the reference's `ChartConfig`
  * (packages/common-utils/src/types.ts:1269-1383), re-shaped as an ADT that
  * compiles to DataFrame transformations (no SQL-string generation).
  */

/** Aggregate functions exposed to users
  * (reference AggregateFunctionSchema, types.ts:161-183). */
sealed trait AggFn
object AggFn {
  case object Count extends AggFn
  case object CountDistinct extends AggFn
  case object Avg extends AggFn
  case object Min extends AggFn
  case object Max extends AggFn
  case object Sum extends AggFn
  /** ClickHouse `any` → first value. */
  case object AnyValue extends AggFn
  /** ClickHouse `anyLast` over the group; deterministic via max_by(ts). */
  case object LastValue extends AggFn
  final case class Quantile(level: Double) extends AggFn
  /** Raw passthrough — no aggregation (reference `none`). */
  case object NoAgg extends AggFn
  /** Counter increase (metric sum only, renderChartConfig.ts:1971-2075). */
  case object Increase extends AggFn
}

/** A condition in one of the two supported languages
  * (reference `whereLanguage: 'sql' | 'lucene'`). */
sealed trait Cond
object Cond {
  final case class Sql(sql: String) extends Cond
  final case class Lucene(query: String) extends Cond
}

/** Structured filter objects (reference FilterSchema types.ts:826-843). */
sealed trait Filter
object Filter {
  final case class CondFilter(cond: Cond) extends Filter
  /** `{type: sql_ast, operator, left, right}` */
  final case class SqlAst(op: String, left: String, right: String) extends Filter
  /** Faceted include-set / exclude-set / numeric range
    * (reference filters.ts:44-143). */
  final case class Included(field: String, values: Seq[String]) extends Filter
  final case class Excluded(field: String, values: Seq[String]) extends Filter
  final case class NumRange(field: String, lo: Double, hi: Double) extends Filter
}

/** One select item (reference DerivedColumnSchema types.ts:390-416). */
final case class SelectItem(
    valueExpression: String, // trusted SQL expression string, like reference
    alias: Option[String] = None,
    aggFn: Option[AggFn] = None,
    /** per-series conditional aggregation → FILTER (WHERE …) */
    aggCondition: Option[Cond] = None)

final case class OrderBy(expression: String, desc: Boolean = false)

final case class DateRange(from: Instant, to: Instant,
    inclusiveEnd: Boolean = true)

/** Granularity: fixed step or auto (≤60 buckets ladder). */
sealed trait Granularity
object Granularity {
  final case class Fixed(seconds: Long) extends Granularity
  case object Auto extends Granularity
}

/** Ratio display modes (reference RatioModeSchema types.ts:1266-1267). */
sealed trait RatioMode
object RatioMode {
  case object PerGroup extends RatioMode
  case object ShareOfTotal extends RatioMode
}

/** The query. `from` names either a registered table/view or a CTE defined in
  * `ctes` (one level deep, like the reference — types.ts:1326-1331). */
final case class Query(
    select: Seq[SelectItem],
    from: String,
    where: Option[Cond] = None,
    filters: Seq[Filter] = Nil,
    filtersOr: Boolean = false, // filtersLogicalOperator
    groupBy: Seq[String] = Nil,
    having: Option[Cond] = None,
    orderBy: Seq[OrderBy] = Nil,
    limit: Option[Int] = None,
    offset: Option[Int] = None,
    granularity: Option[Granularity] = None,
    dateRange: Option[DateRange] = None,
    /** top-N series cap (reference seriesLimit / __hdx_series_limit CTE). */
    seriesLimit: Option[Int] = None,
    ctes: Seq[(String, Query)] = Nil)
