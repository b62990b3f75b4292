package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy hitters: bounded-state approximate top values of a
  * high-cardinality column — the 100-TB path for "top N values" facets
  * where an exact groupBy would shuffle every distinct value (reference
  * facet counts: the kv rollup's per-value counts,
  * 00006_otel_logs_rollups.sql, are exact and unbounded; this caps
  * state at `capacity` counters per cell).
  *
  * Summary semantics (Misra-Gries / SpaceSaving family):
  *  - state is ≤ `capacity` (value → count) counters, merged pointwise;
  *    on overflow every counter is decremented by the (capacity+1)-th
  *    largest count and non-positive counters drop;
  *  - estimates UNDER-count: true_count − n/(capacity+1) ≤ estimate
  *    ≤ true_count (n = stream size), so any value with frequency
  *    > n/(capacity+1) is guaranteed present;
  *  - if the number of distinct values never exceeds `capacity`, no
  *    decrement ever fires and every count is EXACT — the property the
  *    q84 oracle gate exploits (capacity ≥ distinct ⇒ hash-match with
  *    DuckDB's exact GROUP BY).
  *
  * The Aggregator shape makes partials combine map-side before the
  * shuffle: each partition ships at most `capacity` counters per group
  * cell regardless of row count — the same bounded-state contract as
  * [[QuantileSketch]].
  */
final class FrequentItems(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long],
      Map[String, Long]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  private def trim(buf: mutable.Map[String, Long])
      : mutable.Map[String, Long] = {
    if (buf.size <= capacity) buf
    else {
      // decrement all by the (capacity+1)-th largest count; ties on the
      // threshold drop together, so the result can be under capacity
      val dec = buf.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val out = mutable.Map.empty[String, Long]
      buf.foreach { case (k, v) => if (v - dec > 0) out.update(k, v - dec) }
      out
    }
  }

  override def reduce(buf: mutable.Map[String, Long], in: String)
      : mutable.Map[String, Long] = {
    if (in != null) {
      buf.update(in, buf.getOrElse(in, 0L) + 1L)
      if (buf.size > capacity) return trim(buf)
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    trim(a)
  }

  override def finish(r: mutable.Map[String, Long]): Map[String, Long] =
    r.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    ExpressionEncoder[mutable.Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object FrequentItems {
  /** `freq_items(col)` → map<value, estimated count>, ≤ capacity
    * entries. Rank/slice downstream with map_entries + sort. */
  def freqItems(c: Column, capacity: Int): Column =
    udaf(new FrequentItems(capacity),
      ExpressionEncoder[String]()).apply(c)
}
