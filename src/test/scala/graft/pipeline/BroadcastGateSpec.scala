package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The size gate on the broadcast-ingest fast path
  * ([[Sizing.broadcastableBatch]] + the `broadcastNew` flag): at bench
  * scale the batch estimate clears the cap and the band join BROADCASTS
  * the new side; above the cap (lowered here via conf) the same call
  * falls back to the shuffled sort-merge band join — identical output,
  * no broadcast hint. This pins VERDICT-r18 "What's wrong #1": an
  * explicit broadcast() hint bypasses autoBroadcastJoinThreshold, so an
  * un-gated corpus-fraction batch would force the broadcast build at
  * any scale. */
class BroadcastGateSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa xx",
    3L -> "spark shuffles partition data across executors during wide joins",
    4L -> "a lone document resembling nothing else in this tiny corpus",
    5L -> "quick brown foxes jump over lazy dogs near quiet river banks")

  private def corpus = texts.toDF("doc_id", "text")

  private def withConf(k: String, v: String)(body: => Unit): Unit = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  test("gate passes small batches and refuses above the cap / unknowns") {
    val batch = corpus.filter(col("doc_id") % 2 === 0)
    assert(Sizing.broadcastableBatch(batch))
    withConf(Sizing.MaxBroadcastBatchBytesKey, "1") {
      assert(!Sizing.broadcastableBatch(batch))
    }
  }

  test("below the cap the band join broadcasts; above it, sort-merge") {
    val store = Dedup.signatureStore(
      corpus.filter(col("doc_id") <= 3), "doc_id", "text",
      k = 16, shingleN = 3)
    val batch = corpus.filter(col("doc_id") >= 4)
    def plan(broadcastNew: Boolean): String =
      Dedup.crossCorpusPairsFromStore(batch, "doc_id", "text", store,
        k = 16, bands = 8, shingleN = 3, minJaccard = 0.7,
        broadcastNew = broadcastNew)
        .queryExecution.sparkPlan.toString
    // bench-scale shape: the gated flag is true and the new side rides
    // a broadcast band join
    assert(Sizing.broadcastableBatch(batch))
    assert(plan(broadcastNew = true).contains("BroadcastHashJoin"))
    // above the cap the gate flips false; with auto-broadcast disabled
    // (the corpus-scale condition the gate simulates) the same call
    // plans a shuffled sort-merge band join — no broadcast build
    withConf(Sizing.MaxBroadcastBatchBytesKey, "1") {
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        assert(!Sizing.broadcastableBatch(batch))
        val p = plan(broadcastNew = false)
        assert(p.contains("SortMergeJoin"))
        assert(!p.contains("BroadcastHashJoin"))
      }
    }
  }

  test("both paths answer the identical pair set") {
    val store = Dedup.signatureStore(
      corpus.filter(col("doc_id") <= 3), "doc_id", "text",
      k = 16, shingleN = 3)
    val batch = corpus
      .filter(col("doc_id") >= 4)
      .unionByName(Seq(
        6L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa yy")
        .toDF("doc_id", "text"))
    def pairs(broadcastNew: Boolean): Set[(Long, Long)] =
      Dedup.crossCorpusPairsFromStore(batch, "doc_id", "text", store,
        k = 16, bands = 8, shingleN = 3, minJaccard = 0.7,
        broadcastNew = broadcastNew)
        .select("new_id", "kept_id").as[(Long, Long)].collect().toSet
    val b = pairs(broadcastNew = true)
    val s = pairs(broadcastNew = false)
    assert(b == s)
    assert(b.nonEmpty) // doc 6 near-dups docs 1/2 via the store
  }
}
