package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CoreFunctions._

/** PromQL subset → DataFrame compiler.
  *
  * The reference proxies PromQL to ClickHouse's prometheusQueryRange table
  * function (packages/api/src/routers/api/prometheus.ts:413,534); here the
  * same query shapes compile onto the engine's own metric pipelines.
  *
  * Supported grammar (the shapes the reference's dashboards emit):
  *   expr     := mul (('+' | '-') mul)*
  *   mul      := primary (('*' | '/') primary)*
  *   primary  := aggr | func | selector | number | '(' expr ')'
  *   aggr     := (sum|avg|min|max|count) [by (l1, l2…)] ( expr )
  *   func     := rate( selector [dur] [offset] )
  *            | increase( selector [dur] [offset] )
  *            | topk( k, expr ) | bottomk( k, expr )
  *            | histogram_quantile( φ, selector | sum by (…) (selector) )
  *            | (avg|min|max|sum|count|last)_over_time( selector [dur] )
  *   selector := metric_name [{ label op "value", … }] [offset]
  *               op ∈ {=, !=, =~, !~}
  *   offset   := 'offset' <n>(s|m|h|d)
  *   dur      := <n>(s|m|h|d)
  * histogram_quantile evaluates the selector against the exp-histogram
  * frame through the engine's 5-stage quantile pipeline; *_over_time
  * windows tumble at the range width (documented deviation from the
  * sliding lookback).
  * Binary ops join vector operands on (bucket, shared labels) — PromQL
  * one-to-one vector matching on the intersection of output labels;
  * scalar operands broadcast. Documented deviation: x/0 yields NULL
  * (Spark division), where PromQL yields ±Inf.
  *
  * Semantics notes (documented deviations): rate/increase evaluate on
  * step-aligned tumbling buckets (the engine's counterRate) rather than a
  * sliding lookback at each step; gauges aggregate last-value per bucket.
  */
object PromQl {

  // ------------------------------------------------------------------ AST
  sealed trait Expr
  final case class Selector(metric: String,
      matchers: Seq[(String, String, String)],
      offsetSeconds: Long = 0) extends Expr
  final case class Rate(sel: Selector, windowSeconds: Long,
      increase: Boolean) extends Expr
  final case class Aggr(op: String, by: Seq[String], inner: Expr)
      extends Expr
  final case class BinOp(op: Char, l: Expr, r: Expr) extends Expr
  final case class ScalarLit(v: Double) extends Expr
  /** topk/bottomk: k series per step bucket ranked by value. */
  final case class TopK(k: Int, inner: Expr, bottom: Boolean) extends Expr
  /** histogram_quantile(φ, …) over the exp-histogram frame; `by` comes
    * from the canonical inner `sum by (…) (selector)` shape. */
  final case class HistQuantile(phi: Double, sel: Selector,
      by: Seq[String]) extends Expr
  /** avg/min/max/sum/count/last `_over_time(sel[w])` per series per
    * tumbling window. */
  final case class OverTime(op: String, sel: Selector,
      windowSeconds: Long) extends Expr

  final class PromQlParseException(msg: String) extends Exception(msg)

  // --------------------------------------------------------------- parser
  def parse(input: String): Expr = new P(input.trim).parseExpr(top = true)

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def fail(m: String) =
      throw new PromQlParseException(s"$m at $i in '$s'")

    def parseExpr(top: Boolean): Expr = {
      val e = parseAddSub()
      ws()
      if (top && i < s.length) fail(s"trailing input '${s.substring(i)}'")
      e
    }

    private def parseAddSub(): Expr = {
      var l = parseMulDiv()
      ws()
      while (i < s.length && (s(i) == '+' || s(i) == '-')) {
        val op = s(i); i += 1
        l = BinOp(op, l, parseMulDiv())
        ws()
      }
      l
    }

    private def parseMulDiv(): Expr = {
      var l = parsePrimary()
      ws()
      while (i < s.length && (s(i) == '*' || s(i) == '/')) {
        val op = s(i); i += 1
        l = BinOp(op, l, parsePrimary())
        ws()
      }
      l
    }

    private def parsePrimary(): Expr = {
      ws()
      if (i < s.length && s(i) == '(') {
        i += 1
        val e = parseAddSub()
        expect(')')
        return e
      }
      if (i < s.length && (s(i).isDigit || s(i) == '.')) {
        val n = readWhile(c => c.isDigit || c == '.')
        return ScalarLit(n.toDouble)
      }
      val ident = readIdent()
      ws()
      val e: Expr = ident match {
        case "sum" | "avg" | "min" | "max" | "count" =>
          val by =
            if (s.startsWith("by", i)) { i += 2; ws(); readParenIdents() }
            else Nil
          ws(); expect('(')
          val inner = parseAddSub()
          ws(); expect(')')
          Aggr(ident, by, inner)
        case "rate" | "increase" =>
          expect('(')
          val sel0 = parseSelector(readIdent())
          // Prometheus puts `offset` AFTER the range brackets; an offset
          // consumed by parseSelector means `m offset 1h[5m]` — reject it
          // rather than silently dropping the modifier
          if (sel0.offsetSeconds != 0)
            fail("offset must follow the range selector ([dur] offset d)")
          val w = readDuration()
          val off = readOffsetOpt()
          ws(); expect(')')
          Rate(sel0.copy(offsetSeconds = off), w,
            increase = ident == "increase")
        case "topk" | "bottomk" =>
          expect('(')
          ws()
          val k = readWhile(_.isDigit)
          if (k.isEmpty) fail("expected k")
          ws(); expect(',')
          val inner = parseAddSub()
          ws(); expect(')')
          TopK(k.toInt, inner, bottom = ident == "bottomk")
        case "histogram_quantile" =>
          expect('(')
          ws()
          val phi = readWhile(c => c.isDigit || c == '.')
          if (phi.isEmpty) fail("expected quantile level")
          ws(); expect(',')
          val inner = parseAddSub()
          ws(); expect(')')
          inner match {
            case sel: Selector => HistQuantile(phi.toDouble, sel, Nil)
            case Aggr("sum", by, sel: Selector) =>
              HistQuantile(phi.toDouble, sel, by)
            case _ => fail("histogram_quantile expects a selector or " +
              "sum by (…) (selector)")
          }
        case ot if ot.endsWith("_over_time") &&
            Set("avg", "min", "max", "sum", "count", "last")
              .contains(ot.dropRight(10)) =>
          expect('(')
          val sel0 = parseSelector(readIdent())
          if (sel0.offsetSeconds != 0)
            fail("offset must follow the range selector ([dur] offset d)")
          val w = readDuration()
          val off = readOffsetOpt()
          ws(); expect(')')
          OverTime(ot.dropRight(10), sel0.copy(offsetSeconds = off), w)
        case name if name.nonEmpty => parseSelector(name)
        case _ => fail("expected expression")
      }
      e
    }

    private def parseSelector(name: String): Selector = {
      ws()
      val matchers =
        if (i < s.length && s(i) == '{') {
          i += 1
          val ms = Seq.newBuilder[(String, String, String)]
          ws()
          while (i < s.length && s(i) != '}') {
            val label = readIdent()
            ws()
            val op =
              if (s.startsWith("!=", i)) { i += 2; "!=" }
              else if (s.startsWith("=~", i)) { i += 2; "=~" }
              else if (s.startsWith("!~", i)) { i += 2; "!~" }
              else if (s.startsWith("=", i)) { i += 1; "=" }
              else fail("expected matcher operator")
            ws()
            ms += ((label, op, readString()))
            ws()
            if (i < s.length && s(i) == ',') { i += 1; ws() }
          }
          expect('}')
          ms.result()
        } else Nil
      Selector(name, matchers, readOffsetOpt())
    }

    /** `offset <dur>` modifier (bare duration, no brackets); 0 if absent. */
    private def readOffsetOpt(): Long = {
      ws()
      if (s.startsWith("offset", i) &&
          (i + 6 >= s.length || !s(i + 6).isLetterOrDigit)) {
        i += 6; ws()
        val n = readWhile(_.isDigit)
        if (n.isEmpty) fail("expected offset duration")
        val unit = s(i); i += 1
        n.toLong * durationMult(unit)
      } else 0L
    }

    private def durationMult(unit: Char): Long = unit match {
      case 's' => 1L; case 'm' => 60L; case 'h' => 3600L
      case 'd' => 86400L
      case u => fail(s"bad duration unit '$u'")
    }

    private def readDuration(): Long = {
      ws(); expect('[')
      val n = readWhile(_.isDigit)
      if (n.isEmpty) fail("expected duration")
      val unit = s(i); i += 1
      expect(']')
      n.toLong * durationMult(unit)
    }

    private def readParenIdents(): Seq[String] = {
      expect('(')
      val out = Seq.newBuilder[String]
      ws()
      while (i < s.length && s(i) != ')') {
        out += readIdent()
        ws()
        if (i < s.length && s(i) == ',') { i += 1; ws() }
      }
      expect(')')
      out.result()
    }

    private def readIdent(): String =
      readWhile(c => c.isLetterOrDigit || c == '_' || c == ':')
    private def readWhile(p: Char => Boolean): String = {
      val start = i
      while (i < s.length && p(s(i))) i += 1
      s.substring(start, i)
    }
    private def readString(): String = {
      if (i >= s.length || s(i) != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) { sb += s(i + 1); i += 2 }
        else { sb += s(i); i += 1 }
      }
      if (i >= s.length) fail("unclosed string")
      i += 1
      sb.toString
    }
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s(i) != c) fail(s"expected '$c'")
      i += 1
    }
  }

  // ------------------------------------------------------------- compiler

  /** Evaluate over an OTel metric frame (gauge or sum shape, FIXTURES §3)
    * as a range query at `stepSeconds`. Output: __time_bucket, grouping
    * labels…, value. */
  def eval(df: DataFrame, query: String, stepSeconds: Long): DataFrame =
    compile(df, parse(query), stepSeconds)

  private def labelCol(label: String, df: DataFrame): Column =
    // well-known labels are physical columns; everything else resolves
    // into the Attributes map
    if (df.columns.contains(label)) col(label)
    else element_at(col("Attributes"), label)

  private def matcherPred(m: (String, String, String), df: DataFrame)
      : Column = {
    val (label, op, v) = m
    val c = labelCol(label, df)
    // PromQL regex matchers are fully anchored
    val anchored = s"^(?:$v)$$"
    op match {
      case "=" => c === v
      case "!=" => c.isNull || c =!= v
      case "=~" => c.rlike(anchored)
      case "!~" => c.isNull || !c.rlike(anchored)
    }
  }

  private def applySelector(df: DataFrame, sel: Selector): DataFrame = {
    val base = df.filter(col("MetricName") === sel.metric)
    val matched =
      sel.matchers.foldLeft(base)((d, m) => d.filter(matcherPred(m, d)))
    // `offset d`: evaluate the series d seconds in the past — shifting the
    // data forward by d lands the historical points in the current buckets
    if (sel.offsetSeconds == 0) matched
    else matched.withColumn("TimeUnix",
      col("TimeUnix") + expr(s"INTERVAL ${sel.offsetSeconds} SECOND"))
  }

  private def compile(df: DataFrame, e: Expr, step: Long): DataFrame =
    e match {
      case sel: Selector =>
        // instant-vector semantics per series: last value per step bucket
        MetricCompiler.gauge(applySelector(df, sel), step, "last_value")
      case Rate(sel, _, increase) =>
        val rated = MetricCompiler.counterRate(applySelector(df, sel), step)
        if (increase) rated.withColumnRenamed("rate", "value")
        else rated.withColumn("value", col("rate") / step).drop("rate")
      case Aggr(op, by, inner) =>
        // aggregations over selectors/rates aggregate from the source
        // directly so grouping labels stay available; `by` labels resident
        // in the Attributes map are materialized first (withLabels is
        // idempotent for physical columns)
        inner match {
          case sel: Selector =>
            val src = withLabels(applySelector(df, sel), by)
            // per-series last_value, then the outer op across series
            MetricCompiler.gauge(src, step, op, by)
          case Rate(sel, _, increase) =>
            val src = withLabels(applySelector(df, sel), by)
            // rate per series (series key kept in the grouping), then the
            // outer op across series — avg/min/max/count need the
            // per-series rates, and for sum the result is identical
            val perSeries =
              MetricCompiler.counterRatePerSeries(src, step, by)
            val valued =
              if (increase) perSeries.withColumnRenamed("rate", "value")
              else perSeries.withColumn("value", col("rate") / step)
                .drop("rate")
            aggregate0(valued, op, by)
          case ot: OverTime =>
            aggregate0(overTimePerSeries(df, ot, by), op, by)
          case _ => aggregate0(compile(df, inner, step), op, by)
        }
      case TopK(k, inner, bottom) =>
        import org.apache.spark.sql.expressions.Window
        val g = compile(df, inner, step)
        val labels = g.columns.toSeq
          .filter(c => c != TimeBucketAlias && c != "value")
        val order = (if (bottom) col("value").asc else col("value").desc) +:
          labels.map(col(_).asc)
        val w = Window.partitionBy(col(TimeBucketAlias)).orderBy(order: _*)
        g.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= k)
          .drop("__rk")
      case HistQuantile(phi, sel, by) =>
        // routes onto the engine's exp-histogram quantile pipeline — the
        // reference proxies histogram_quantile to its own histogram
        // machinery the same way (prometheus.ts:413-534)
        ExpHistograms.quantile(
          withLabels(applySelector(df, sel), by), phi, step, by)
      case ot: OverTime =>
        // standalone *_over_time mirrors bare-selector semantics (one value
        // across series per bucket); the pick is ordered by the series key —
        // the bucket itself is constant within the group, which would leave
        // the choice to partitioning order
        val perSeries = overTimePerSeries(df, ot, Nil)
        perSeries.groupBy(col(TimeBucketAlias))
          .agg(max_by(col("value"), col("__series")).as("value"))
      case BinOp(op, l, r) =>
        def f(a: Column, b: Column): Column = op match {
          case '+' => a + b
          case '-' => a - b
          case '*' => a * b
          case '/' => a / b
        }
        (l, r) match {
          case (ScalarLit(_), ScalarLit(_)) =>
            throw new PromQlParseException(
              "scalar-only expressions are not queries")
          case (ScalarLit(a), _) =>
            compile(df, r, step).withColumn("value", f(lit(a), col("value")))
          case (_, ScalarLit(b)) =>
            compile(df, l, step).withColumn("value", f(col("value"), lit(b)))
          case _ =>
            // one-to-one vector matching on (bucket ∩ shared labels)
            val ld = compile(df, l, step).withColumnRenamed("value", "__lv")
            val rd = compile(df, r, step).withColumnRenamed("value", "__rv")
            val keys = ld.columns.toSeq
              .filter(c => c != "__lv" && rd.columns.contains(c))
            ld.join(rd, keys)
              .withColumn("value", f(col("__lv"), col("__rv")))
              .drop("__lv", "__rv")
        }
      case ScalarLit(_) =>
        throw new PromQlParseException(
          "scalar-only expressions are not queries")
    }

  private def aggregate0(g: DataFrame, op: String, by: Seq[String])
      : DataFrame = {
    val agg = op match {
      case "sum" => sum(col("value"))
      case "avg" => avg(col("value"))
      case "min" => min(col("value"))
      case "max" => max(col("value"))
      case "count" => count(col("value"))
    }
    g.groupBy((col(TimeBucketAlias) +: by.map(col)): _*)
      .agg(agg.as("value"))
  }

  /** Per-series window aggregate for `*_over_time`: one tumbling window of
    * the requested range per series (documented deviation: windows tumble
    * at the range width rather than sliding per step). Output columns:
    * __series, __time_bucket, by…, value. */
  private def overTimePerSeries(df: DataFrame, ot: OverTime,
      by: Seq[String]): DataFrame = {
    val src = withLabels(applySelector(df, ot.sel), by)
    val v = col("Value").cast("double")
    val agg = ot.op match {
      case "avg" => avg(v)
      case "min" => min(v)
      case "max" => max(v)
      case "sum" => sum(v)
      case "count" => count(v)
      case "last" => max_by(v, col("TimeUnix"))
    }
    src.withColumn("__series", MetricCompiler.attributesHash(src))
      .withColumn(TimeBucketAlias,
        timeBucket(col("TimeUnix"), ot.windowSeconds))
      .groupBy((col("__series") +: col(TimeBucketAlias) +:
        by.map(col)): _*)
      .agg(agg.as("value"))
  }

  /** Pre-materialize attribute labels as columns so `by (label)` grouping
    * works for map-resident labels. */
  def withLabels(df: DataFrame, labels: Seq[String]): DataFrame =
    labels.foldLeft(df)((d, l) =>
      if (d.columns.contains(l)) d
      else d.withColumn(l, element_at(col("Attributes"), l)))
}
