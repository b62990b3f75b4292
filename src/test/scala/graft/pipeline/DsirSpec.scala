package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  test("hashedFeatures counts unigrams+bigrams, pre-aggregated per doc") {
    val df = Seq((1L, "a b a"), (2L, ""), (3L, "  x  ")).toDF("id", "text")
    val f = Dsir.hashedFeatures(df, "id", "text", B)
      .as[(Long, Long, Long)].collect()
    // doc 1: grams a, b, a, "a b", "b a" → 5 total over ≤4 buckets
    assert(f.filter(_._1 == 1L).map(_._3).sum == 5L)
    // empty doc emits nothing; single-token doc emits one unigram
    assert(!f.exists(_._1 == 2L))
    assert(f.filter(_._1 == 3L).map(_._3).sum == 1L)
    // kernel bucket == portable Column form (md5-prefix convention)
    val grams = Seq("a", "b", "a b", "b a", "x").toDF("g")
      .select(col("g"), Dsir.gramBucket(col("g"), B).as("bk"))
      .as[(String, Long)].collect().toMap
    val aAndB = f.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    assert(aAndB(grams("a")) == 2L) // "a" twice
    assert(aAndB(grams("a b")) == 1L)
  }

  test("bucketLogProbs applies Laplace smoothing over all buckets") {
    val feats = Seq((1L, 3L, 4L), (2L, 7L, 6L)).toDF("id", "bucket", "cnt")
    val p = Dsir.bucketLogProbs(feats, B, alpha = 1.0)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(p(3L) - math.log(5.0 / (10 + B))) < 1e-12)
    assert(math.abs(p(7L) - math.log(7.0 / (10 + B))) < 1e-12)
    assert(math.abs(Dsir.floorLogProb(feats, B) -
      math.log(1.0 / (10 + B))) < 1e-12)
  }

  test("importanceWeights ranks target-like docs above off-domain docs") {
    val raw = Seq(
      (1L, "spark shuffle partition spark executor"),
      (2L, "spark partition shuffle"),
      (3L, "recipe butter sugar flour oven"),
      (4L, "recipe oven sugar")).toDF("id", "text")
    val target = Seq(
      (10L, "spark executor shuffle partition"),
      (11L, "spark partition memory")).toDF("id", "text")
    val w = Dsir.importanceWeights(raw, "id", "text", target, "text",
      buckets = 1024).as[(Long, Double)].collect().toMap
    assert(w(1L) > w(3L) && w(2L) > w(4L))
    // the domain gap is substantive, not float noise (with corpora this
    // small the Laplace floor dominates absolute signs — only ordering
    // and gaps are contractual)
    assert(w(1L) - w(3L) > 1.0)
  }

  test("resampleTopFrac keeps ceil(frac*n) rows, deterministically") {
    val w = Seq((1L, 5.0), (2L, 4.0), (3L, -10.0), (4L, -11.0), (5L, 0.0))
      .toDF("id", "logw")
    // tiny temperature → Gumbel noise negligible vs weight gaps
    val sel = Dsir.resampleTopFrac(w, "id", 0.4, temperature = 1e-6)
      .select("id").as[Long].collect().toSet
    assert(sel == Set(1L, 2L))
    val again = Dsir.resampleTopFrac(w, "id", 0.4, temperature = 1e-6)
      .select("id").as[Long].collect().toSet
    assert(again == sel)
    // at temperature 1.0 the noise matters but is still deterministic
    val s1 = Dsir.resampleTopFrac(w, "id", 0.6).select("id")
      .as[Long].collect().toSet
    assert(s1.size == 3 &&
      s1 == Dsir.resampleTopFrac(w, "id", 0.6).select("id")
        .as[Long].collect().toSet)
    // the exact mode refuses selections past its single-task cap
    val e = intercept[IllegalArgumentException] {
      Dsir.resampleTopFrac(w, "id", 1.0, maxExact = 3)
    }
    assert(e.getMessage.contains("resampleAboveQuantile"))
  }

  test("resampleAboveQuantile matches the exact top-k at tiny scale") {
    val w = (1L to 200L).map(i => (i, (i % 17).toDouble))
      .toDF("id", "logw")
    val exact = Dsir.resampleTopFrac(w, "id", 0.25).select("id")
      .as[Long].collect().toSet
    // the threshold cut lands within one quantile-index convention of
    // the exact set (all 200 scores distinct: gumbel noise breaks ties)
    val approx = Dsir.resampleAboveQuantile(w, "id", 0.25,
      relErr = 0.0001).select("id").as[Long].collect().toSet
    assert((approx diff exact).size + (exact diff approx).size <= 2,
      s"exact=${exact.size} approx=${approx.size}")
    assert(Dsir.resampleAboveQuantile(w, "id", 1.0).count() == 200)
  }
}
