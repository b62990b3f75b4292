package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized invariants for the round-6 pipeline operators —
  * each property is checked over many generated cases with a FIXED seed
  * (deterministic, no flake budget), probing the input space the
  * hand-written fixtures can't enumerate. */
class FuzzInvariantsSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences equals the sequential prefix sum for random " +
      "corpora under random partitionings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val docs = (1L to (20 + rnd.nextInt(60))).map(i =>
        (i, rnd.nextInt(9).toLong)) // includes zero-token docs
      val ctx = 1 + rnd.nextInt(12)
      val nPart = 1 + rnd.nextInt(7)
      // sequential ground truth
      var off = 0L
      val want = docs.map { case (id, tok) =>
        val r = (id, off, off / ctx, (off + math.max(tok, 1) - 1) / ctx)
        off += tok
        r
      }
      val got = Curation.packSequences(
        docs.toDF("id", "tok").repartition(nPart), "id", "tok", ctx)
        .orderBy("id")
        .select("id", "start_off", "sample_id", "end_sample_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == want, s"trial $trial ctx=$ctx parts=$nPart")
    }
  }

  test("BPE segmentation always reconstructs the word exactly") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    val dict = (1 to 30).map { _ =>
      val w = (1 to 1 + rnd.nextInt(8))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (w, 1L + rnd.nextInt(20))
    }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
    val ranks = Bpe.train(dict, 25).zipWithIndex.toMap
    for (_ <- 1 to 200) {
      val w = (1 to 1 + rnd.nextInt(12))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val toks = Bpe.segmentWord(w, ranks)
      assert(toks.mkString == w, s"word $w -> $toks")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("DSIR hashed features conserve the gram count: " +
      "sum(cnt) == unigrams + bigrams per doc") {
    val rnd = new scala.util.Random(13)
    val docs = (1L to 30L).map { i =>
      val n = rnd.nextInt(12)
      (i, (1 to n).map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
    }
    val got = Dsir.hashedFeatures(docs.toDF("id", "text"), "id", "text",
      buckets = 32)
      .groupBy("id").agg(sum("cnt").as("s"))
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      val n = text.split("\\s+").count(_.nonEmpty)
      val want = if (n == 0) 0L else (n + (n - 1)).toLong
      assert(got.getOrElse(id, 0L) == want, s"doc $id '$text'")
    }
  }

  test("shardOf is stable, in-range, and partitions the id space") {
    val ids = (1L to 500L).toDF("id")
    val shards = ids.select(Curation.shardOf(col("id"), 8).as("s"))
      .as[Long].collect()
    assert(shards.forall(s => s >= 0 && s < 8))
    // every shard populated at n≫shards (md5 uniformity sanity)
    assert(shards.distinct.sorted.toSeq == (0L to 7L))
  }
}
