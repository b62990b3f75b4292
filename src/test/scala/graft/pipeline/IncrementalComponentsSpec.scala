package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.incrementalComponents]]: merging the previous component
  * table with a batch's edges is row-identical to the from-scratch
  * closure over the full corpus — across one merge, across two
  * sequential merges (state carried twice), and when the connecting
  * doc is a cross-batch near-dup whose edge exists ONLY via the
  * store (the load-bearing path). */
class IncrementalComponentsSpec extends SparkSpec {
  import spark.implicits._

  // near-dup families: a/b/c are append-variants of one text (J >= 0.7
  // pairwise at 3-shingles), x/y of another; z is a singleton
  private val docs = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa xx",
    3L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa yy",
    10L -> "spark shuffles partition data across executors during wide joins",
    11L -> "spark shuffles partition data across executors during wide joins zz",
    20L -> "a lone document resembling nothing else in this tiny corpus",
    // an exact clone of doc 2 arriving in a LATER batch: connects via
    // the store cross pair + the batch content star
    30L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa xx")
    .toDF("doc_id", "text")

  private def comps(df: DataFrame): Seq[(Long, Long)] =
    Dedup.components(df, "doc_id", "text", k = 16, bands = 8,
      shingleN = 3, minJaccard = 0.7)
      .as[(Long, Long)].collect().sorted.toSeq

  private def merge(prev: DataFrame, old: DataFrame, batch: DataFrame)
      : DataFrame =
    Dedup.incrementalComponents(prev,
      Dedup.signatureStore(old, "doc_id", "text", k = 16, shingleN = 3),
      batch, "doc_id", "text", k = 16, bands = 8, shingleN = 3,
      minJaccard = 0.7)

  test("one merge == from-scratch closure; two sequential merges == " +
      "from-scratch closure over all three slices") {
    val b1 = docs.filter(col("doc_id") <= 2L)   // 1, 2 (paired)
    val b2 = docs.filter(col("doc_id") > 2L && col("doc_id") < 20L)
    val b3 = docs.filter(col("doc_id") >= 20L)  // 20 (singleton), 30

    val prev1 = Dedup.components(b1, "doc_id", "text", k = 16,
      bands = 8, shingleN = 3, minJaccard = 0.7)
    val m1 = merge(prev1, b1, b2)
    assert(m1.as[(Long, Long)].collect().sorted.toSeq ==
      comps(b1.unionByName(b2)))

    // carry the merged state into a second merge — doc 30 (clone of
    // doc 2, which lives two batches back) must land in component 1
    // purely via the store edge; doc 20 stays unclustered
    val m2 = merge(m1, b1.unionByName(b2), b3)
    val got = m2.as[(Long, Long)].collect().sorted.toSeq
    assert(got == comps(docs))
    assert(got.contains((30L, 1L)))
    assert(!got.map(_._1).contains(20L))
  }

  test("dropping the prev star or the cross edges would split the " +
      "clusters the gate construction plants (the merge is " +
      "load-bearing, not decorative)") {
    val old = docs.filter(col("doc_id") <= 11L)
    val batch = docs.filter(col("doc_id") > 11L)
    val prev = Dedup.components(old, "doc_id", "text", k = 16,
      bands = 8, shingleN = 3, minJaccard = 0.7)
    // sanity: the true closure joins 30 to {1,2,3}
    assert(comps(docs).contains((30L, 1L)))
    // no-prev merge loses the old pairs entirely
    val noPrev = merge(prev.filter(lit(false)), old, batch)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(noPrev != comps(docs))
    // empty-store merge loses the cross edge: 30 has no within-batch
    // partner, so it vanishes from the table
    val noStore = Dedup.incrementalComponents(prev,
      Dedup.signatureStore(old.filter(lit(false)), "doc_id", "text",
        k = 16, shingleN = 3),
      batch, "doc_id", "text", k = 16, bands = 8, shingleN = 3,
      minJaccard = 0.7).as[(Long, Long)].collect().sorted.toSeq
    assert(!noStore.map(_._1).contains(30L))
  }
}
