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

/** [[TopK]]'s string-id sibling — same bounded 2n-entry buffer, same
  * amortized trim schedule, for corpora whose row ids are strings
  * (UUIDs, document keys). The tie-break compares ids the way Spark's
  * struct sort compares StringType — byte-wise unsigned over the UTF-8
  * encoding (`UTF8String.compareTo`) — NOT java.lang.String's UTF-16
  * code-unit order, which ranks supplementary characters below BMP
  * ones and would diverge from the sorted-slice shape this replaces
  * on exotic ids. */
final class TopKString(n: Int)
    extends Aggregator[(Double, String), List[(Double, String)],
      Seq[(Double, String)]] {
  require(n > 0, "n must be positive")

  private def cmp(a: (Double, String), b: (Double, String)): Int = {
    // fold -0.0 onto +0.0 for the comparison like Spark's comparators;
    // Double.compare is otherwise the same total order (NaN largest)
    val sa = if (a._1 == 0.0) 0.0 else a._1
    val sb = if (b._1 == 0.0) 0.0 else b._1
    val c = java.lang.Double.compare(sa, sb)
    if (c != 0) c
    else java.util.Arrays.compareUnsigned(
      a._2.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
  private val ord: Ordering[(Double, String)] = cmp(_, _)

  override def zero: List[(Double, String)] = Nil

  override def reduce(buf: List[(Double, String)], in: (Double, String))
      : List[(Double, String)] = {
    val next = in :: buf
    if (next.lengthCompare(2 * n) > 0) next.sorted(ord).take(n) else next
  }

  override def merge(a: List[(Double, String)], b: List[(Double, String)])
      : List[(Double, String)] = {
    val m = a ::: b
    if (m.lengthCompare(n) > 0) m.sorted(ord).take(n) else m
  }

  override def finish(r: List[(Double, String)]): Seq[(Double, String)] =
    r.sorted(ord).take(n)

  override def bufferEncoder: Encoder[List[(Double, String)]] =
    ExpressionEncoder[List[(Double, String)]]()
  override def outputEncoder: Encoder[Seq[(Double, String)]] =
    ExpressionEncoder[Seq[(Double, String)]]()
}

object TopK {
  /** `top_smallest(score, id)` → array<struct<_1: score, _2: id>>,
    * ascending (score, id), ≤ n entries. Both inputs must be non-null;
    * ids must be (castable to) integral — the ANN paths' numeric row
    * ids. */
  def topSmallest(score: Column, id: Column, n: Int): Column =
    udaf(new TopK(n), ExpressionEncoder[(Double, Long)]())
      .apply(score, id)

  /** [[topSmallest]] for string ids — ascending (score, UTF-8-binary
    * id), ≤ n entries, bounded buffer. Both inputs must be non-null. */
  def topSmallestString(score: Column, id: Column, n: Int): Column =
    udaf(new TopKString(n), ExpressionEncoder[(Double, String)]())
      .apply(score, id)
}
