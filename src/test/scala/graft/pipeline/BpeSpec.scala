package graft.pipeline

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al. 2016 §3.2's worked dictionary. Hand-derived merge
  // sequence: pair counts weighted by freq give (e,s)=9 (newest 6 +
  // widest 3) tied with (s,t)=9 and (t,</w>)=9 — lexicographic tiebreak
  // picks (e,s); then (es,t)=9, (est,</w>)=9, (l,o)=7 over (o,w)=7,
  // (lo,w)=7.
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("train learns the classic Sennrich merge sequence") {
    val merges = Bpe.train(sennrich, 5)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("segmentWord tokenizes an UNSEEN word with learned merges") {
    val ranks = Bpe.train(sennrich, 5).zipWithIndex.toMap
    // "lowest" is not in the training dict; BPE composes low + est
    assert(Bpe.segmentWord("lowest", ranks) == Seq("low", "est"))
    assert(Bpe.segmentWord("low", ranks) == Seq("low"))
    // no applicable merges → character fallback (</w> folded into 'z')
    assert(Bpe.segmentWord("xyz", ranks) == Seq("x", "y", "z"))
  }

  test("train stops early when no pair repeats") {
    assert(Bpe.train(Seq(("abc", 1L)), 10).isEmpty)
  }

  test("wordFrequencies counts lowercased whitespace words, prunes") {
    val df = Seq((1L, "The the THE cat"), (2L, "cat  sat")).toDF("id", "text")
    val all = Bpe.wordFrequencies(df, "text").as[(String, Long)]
      .collect().toMap
    assert(all == Map("the" -> 3L, "cat" -> 2L, "sat" -> 1L))
    val pruned = Bpe.wordFrequencies(df, "text", minCount = 2L)
      .as[(String, Long)].collect().toMap
    assert(pruned == Map("the" -> 3L, "cat" -> 2L))
  }

  test("collectFrequencies orders deterministically and enforces the cap") {
    val df = Seq((1L, "b a a c c")).toDF("id", "text")
    val freqs = Bpe.wordFrequencies(df, "text")
    assert(Bpe.collectFrequencies(freqs) ==
      Seq(("a", 2L), ("c", 2L), ("b", 1L)))
    val e = intercept[IllegalArgumentException] {
      Bpe.collectFrequencies(freqs, maxWords = 2)
    }
    assert(e.getMessage.contains("maxWords"))
  }

  test("segmentFrame counts words and bpe tokens per doc") {
    val ranks = Bpe.train(sennrich, 5)
    val df = Seq((1L, "lowest low"), (2L, "")).toDF("id", "text")
    val out = Bpe.segmentFrame(df, "id", "text", ranks)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // lowest → [low, est] (2) + low → [low] (1)
    assert(out == Seq((1L, 2L, 3L), (2L, 0L, 0L)))
  }
}
