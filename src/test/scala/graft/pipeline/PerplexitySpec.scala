package graft.pipeline

import graft.SparkSpec

/** Bigram-LM perplexity scoring (CCNet): hand-computed smoothed
  * probabilities on a tiny reference, plus the ordering property the
  * operator exists for — reference-like text scores lower than
  * off-domain text. */
class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val ref =
    Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("id", "text")
  private lazy val model = Perplexity.train(ref, "id", "text")

  test("model counts and totals match the corpus by hand") {
    // tokens: the×2 cat×2 sat ran → N=6, vocab=4(+1 OOV)=5
    assert(model.nTokens == 6 && model.vocab == 5)
    val uni = model.uni.as[(String, Long)].collect().toMap
    assert(uni == Map("the" -> 2L, "cat" -> 2L, "sat" -> 1L, "ran" -> 1L))
    val bi = model.bi.select("gram", "c").as[(String, Long)]
      .collect().toMap
    assert(bi == Map("the cat" -> 2L, "cat sat" -> 1L, "cat ran" -> 1L))
  }

  test("cross-entropy of a seen sentence matches the hand-computed sum") {
    // "the cat sat": P(the)=(2+1)/(6+5)=3/11; P(cat|the)=(2+1)/(2+5)=3/7;
    // P(sat|cat)=(1+1)/(2+5)=2/7 → H = -(ln(3/11)+ln(3/7)+ln(2/7))/3
    val expected =
      -(math.log(3.0 / 11) + math.log(3.0 / 7) + math.log(2.0 / 7)) / 3
    val got = Perplexity.score(Seq((9L, "the cat sat")).toDF("id", "text"),
      "id", "text", model).select("cross_entropy").as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("unseen bigram, unseen context, and OOV floors apply in order") {
    // "cat the": P(cat)=3/11; "cat the" unseen with seen ctx cat →
    //   (0+1)/(2+5)=1/7.
    // "zz qq": P(zz)=(0+1)/11; "zz qq" unseen ctx → 1/(0+5)=1/5.
    val df = Seq((1L, "cat the"), (2L, "zz qq")).toDF("id", "text")
    val got = Perplexity.score(df, "id", "text", model)
      .select("id", "cross_entropy").as[(Long, Double)].collect().toMap
    val e1 = -(math.log(3.0 / 11) + math.log(1.0 / 7)) / 2
    val e2 = -(math.log(1.0 / 11) + math.log(1.0 / 5)) / 2
    assert(math.abs(got(1L) - e1) < 1e-12)
    assert(math.abs(got(2L) - e2) < 1e-12)
  }

  test("reference-like text beats off-domain text; buckets agree") {
    val corpus = Seq(
      (1L, "the cat sat the cat ran"),
      (2L, "the cat sat"),
      (3L, "der hund lief schnell weg"),
      (4L, "el gato corrio rapido"),
      (5L, "cat the ran the"),
      (6L, "totally unseen words everywhere here now")).toDF("id", "text")
    val scored = Perplexity.score(corpus, "id", "text", model)
    val ppl = scored.select("id", "ppl").as[(Long, Double)]
      .collect().toMap
    assert(ppl(1L) < ppl(3L) && ppl(2L) < ppl(4L) && ppl(2L) < ppl(6L))
    val exact = Perplexity.bucketExact(scored, "id", nBuckets = 3)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(exact(1L) == 1 && exact(2L) == 1)
    assert(Seq(3L, 4L, 6L).map(exact).max == 3)
    // threshold labels must be monotone in ppl with the extremes pinned
    // (cut placement at tiny n depends on the sketch's rank convention,
    // so exact bucket equality is not asserted)
    val approx = Perplexity.bucketByThresholds(scored, nBuckets = 3,
      relErr = 0.0001).select("id", "bucket").as[(Long, Int)]
      .collect().toMap
    val orderedByPpl = ppl.toSeq.sortBy(_._2).map(a => approx(a._1))
    assert(orderedByPpl == orderedByPpl.sorted)
    assert(approx(2L) == 1 && approx(4L) == 3)
    val e = intercept[IllegalArgumentException] {
      Perplexity.bucketExact(scored, "id", maxExact = 2)
    }
    assert(e.getMessage.contains("bucketByThresholds"))
  }
}
