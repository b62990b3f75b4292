package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ClickHouse `sumMap(keys, values)` equivalent: per-key sums over
  * (key, value) pair maps, merged associatively (reference use:
  * packages/common-utils/src/core/histogram.ts:588-599 for merging sparse
  * exp-histogram bucket indexes across series).
  *
  * A typed Aggregator so partial maps combine map-side before the shuffle —
  * at scale each series contributes one sparse map per row and the
  * per-(bucket, group) merge happens in the combiner. */
object MapSum extends Aggregator[Map[Long, Long], mutable.Map[Long, Long],
    Map[Long, Long]] {
  override def zero: mutable.Map[Long, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[Long, Long], in: Map[Long, Long])
      : mutable.Map[Long, Long] = {
    if (in != null) in.foreach { case (k, v) =>
      buf.update(k, buf.getOrElse(k, 0L) + v)
    }
    buf
  }

  override def merge(a: mutable.Map[Long, Long], b: mutable.Map[Long, Long])
      : mutable.Map[Long, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    a
  }

  override def finish(r: mutable.Map[Long, Long]): Map[Long, Long] = r.toMap

  override def bufferEncoder: Encoder[mutable.Map[Long, Long]] =
    ExpressionEncoder[mutable.Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()

  lazy val fn = udaf(MapSum)
  /** `sum_map(map_from_arrays(keys, values))`. */
  def sumMap(m: Column): Column = fn(m)
}
