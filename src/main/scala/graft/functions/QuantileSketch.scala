package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ClickHouse `quantileExactState` / `quantileExactMerge` and
  * `uniqExactState` / `uniqExactMerge` analogues backing materialized-view
  * routing (reference maps -State/-Merge combinator pairs onto MV columns,
  * materializedViews.ts:380-465).
  *
  * The rollup stores one value→count histogram map (and one distinct-value
  * set) per cell; query time merges cell partials and finishes with the
  * SAME interpolated-quantile math as the raw-path `percentile`, so a
  * rollup-answered quantile/count_distinct hash-matches the raw answer.
  * Unlike a t-digest the merge is lossless — exactness depends on the
  * column's distinct-value cardinality per cell (quantized observability
  * values stay small), not on row count. Values are float64-coerced like
  * every rollup partial; route only numeric columns.
  */
object QuantileSketch {

  /** Build-side partial: value→count histogram per rollup cell. */
  object HistState extends Aggregator[java.lang.Double,
      mutable.Map[Double, Long], Map[Double, Long]] {
    override def zero: mutable.Map[Double, Long] = mutable.Map.empty

    override def reduce(buf: mutable.Map[Double, Long],
        in: java.lang.Double): mutable.Map[Double, Long] = {
      if (in != null) {
        val v = in.doubleValue()
        buf.update(v, buf.getOrElse(v, 0L) + 1L)
      }
      buf
    }

    override def merge(a: mutable.Map[Double, Long],
        b: mutable.Map[Double, Long]): mutable.Map[Double, Long] = {
      b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
      a
    }

    override def finish(r: mutable.Map[Double, Long]): Map[Double, Long] =
      r.toMap

    override def bufferEncoder: Encoder[mutable.Map[Double, Long]] =
      ExpressionEncoder[mutable.Map[Double, Long]]()
    override def outputEncoder: Encoder[Map[Double, Long]] =
      ExpressionEncoder[Map[Double, Long]]()

    lazy val fn = udaf(HistState)
  }

  /** Query-side merge + finish: exact interpolated quantile over merged
    * value→count histograms — the same `position = level·(N−1)` linear
    * interpolation as Spark's exact percentile, so routed answers match
    * the raw path. */
  final case class QuantileMergeAgg(level: Double)
      extends Aggregator[Map[Double, Long], mutable.Map[Double, Long],
        Double] {
    override def zero: mutable.Map[Double, Long] = mutable.Map.empty

    override def reduce(buf: mutable.Map[Double, Long],
        in: Map[Double, Long]): mutable.Map[Double, Long] = {
      if (in != null) in.foreach { case (k, v) =>
        buf.update(k, buf.getOrElse(k, 0L) + v)
      }
      buf
    }

    override def merge(a: mutable.Map[Double, Long],
        b: mutable.Map[Double, Long]): mutable.Map[Double, Long] = {
      b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
      a
    }

    override def finish(hist: mutable.Map[Double, Long]): Double = {
      if (hist.isEmpty) return Double.NaN
      val sorted = hist.toArray.sortBy(_._1)
      val n = sorted.iterator.map(_._2).sum
      val pos = level * (n - 1)
      val lowerIdx = math.floor(pos).toLong
      val higherIdx = math.ceil(pos).toLong
      var cum = 0L
      var lowerKey = sorted.head._1
      var higherKey = sorted.head._1
      var i = 0
      while (i < sorted.length && cum <= higherIdx) {
        val (v, c) = sorted(i)
        if (cum <= lowerIdx && lowerIdx < cum + c) lowerKey = v
        if (cum <= higherIdx && higherIdx < cum + c) higherKey = v
        cum += c
        i += 1
      }
      if (lowerIdx == higherIdx) lowerKey
      else (higherIdx - pos) * lowerKey + (pos - lowerIdx) * higherKey
    }

    override def bufferEncoder: Encoder[mutable.Map[Double, Long]] =
      ExpressionEncoder[mutable.Map[Double, Long]]()
    override def outputEncoder: Encoder[Double] =
      ExpressionEncoder[Double]()
  }

  /** Build-side partial: distinct-value set per rollup cell. */
  object DistinctState extends Aggregator[java.lang.Double,
      mutable.Set[Double], Seq[Double]] {
    override def zero: mutable.Set[Double] = mutable.Set.empty
    override def reduce(buf: mutable.Set[Double], in: java.lang.Double)
        : mutable.Set[Double] = {
      if (in != null) buf += in.doubleValue()
      buf
    }
    override def merge(a: mutable.Set[Double], b: mutable.Set[Double])
        : mutable.Set[Double] = { a ++= b; a }
    override def finish(r: mutable.Set[Double]): Seq[Double] = r.toSeq
    override def bufferEncoder: Encoder[mutable.Set[Double]] =
      ExpressionEncoder[mutable.Set[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
    lazy val fn = udaf(DistinctState)
  }

  /** Query-side merge + finish: exact distinct count over merged sets. */
  object DistinctMergeAgg extends Aggregator[Seq[Double],
      mutable.Set[Double], Long] {
    override def zero: mutable.Set[Double] = mutable.Set.empty
    override def reduce(buf: mutable.Set[Double], in: Seq[Double])
        : mutable.Set[Double] = {
      if (in != null) buf ++= in
      buf
    }
    override def merge(a: mutable.Set[Double], b: mutable.Set[Double])
        : mutable.Set[Double] = { a ++= b; a }
    override def finish(r: mutable.Set[Double]): Long = r.size.toLong
    override def bufferEncoder: Encoder[mutable.Set[Double]] =
      ExpressionEncoder[mutable.Set[Double]]()
    override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
    lazy val fn = udaf(DistinctMergeAgg)
  }

  /** value→count histogram partial of a double column. */
  def histState(v: Column): Column = HistState.fn(v.cast("double"))

  /** Exact quantile from merged histogram partials. */
  def quantileMerge(level: Double, hist: Column): Column =
    udaf(QuantileMergeAgg(level),
      ExpressionEncoder[Map[Double, Long]]())(hist)

  /** Distinct-value set partial of a double column. */
  def distinctState(v: Column): Column = DistinctState.fn(v.cast("double"))

  /** Exact distinct count from merged set partials. */
  def distinctMerge(sets: Column): Column = DistinctMergeAgg.fn(sets)
}
