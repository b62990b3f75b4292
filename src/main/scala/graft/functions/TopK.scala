package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-n partial aggregate: the n SMALLEST (score, id) pairs
  * of a group, kept in O(n) buffer state — the map-side half of the
  * ANN shortlist reductions ([[graft.pipeline.Similarity]]). The
  * previous shape (`collect_list` + `array_sort` + `slice`) computed
  * the same result but buffered EVERY candidate a partition holds for
  * a probe before sorting; this buffer never exceeds 2n entries, so a
  * 100-TB scan's per-(probe, partition) state is k-bounded instead of
  * partition-sized, and partials combine map-side before the shuffle
  * (the [[FrequentItems]] / [[QuantileSketch]] bounded-state
  * contract).
  *
  * Ordering parity with the sorted-slice shape (SimilaritySpec pins
  * determinism against knnBrute): ascending (score, id) with ties
  * broken on id — Scala's total order on Double matches Spark's
  * struct sort for NaN (largest), and a `s == 0.0` normalization
  * folds -0.0 onto +0.0 the way Spark's comparators do (IEEE == is
  * true for the pair, java.lang.Double.compare is not). Output values
  * keep their raw bits; only the COMPARISON normalizes.
  */
final class TopK(n: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)],
      Seq[(Double, Long)]] {
  require(n > 0, "n must be positive")

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (s, id) => (if (s == 0.0) 0.0 else s, id) }

  override def zero: List[(Double, Long)] = Nil

  // amortized-O(log) trims: prepend per row, sort only when the buffer
  // doubles past n — state stays ≤ 2n entries
  override def reduce(buf: List[(Double, Long)], in: (Double, Long))
      : List[(Double, Long)] = {
    val next = in :: buf
    if (next.lengthCompare(2 * n) > 0) next.sorted(ord).take(n) else next
  }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)])
      : List[(Double, Long)] = {
    val m = a ::: b
    if (m.lengthCompare(n) > 0) m.sorted(ord).take(n) else m
  }

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] =
    r.sorted(ord).take(n)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {
  /** `top_smallest(score, id)` → array<struct<_1: score, _2: id>>,
    * ascending (score, id), ≤ n entries. Both inputs must be non-null;
    * ids must be (castable to) integral — the ANN paths' numeric row
    * ids. */
  def topSmallest(score: Column, id: Column, n: Int): Column =
    udaf(new TopK(n), ExpressionEncoder[(Double, Long)]())
      .apply(score, id)
}
