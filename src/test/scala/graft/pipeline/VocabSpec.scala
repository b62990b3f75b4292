package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("vocabStats ranks types by (count desc, token asc) with share " +
      "and cumulative coverage over the WHOLE corpus, not just top-k") {
    val df = Seq("the cat sat", "the cat ran", "the dog sat on the mat")
      .toDF("text")
    // counts: the=4, cat=2, sat=2, dog=1, mat=1, on=1, ran=1 (N=12)
    val out = TextAnalysis.vocabStats(df, "text", 3)
      .as[(Int, String, Long, Double, Double)].collect().toSeq
    assert(out.map(t => (t._1, t._2, t._3)) ==
      Seq((1, "the", 4L), (2, "cat", 2L), (3, "sat", 2L)))
    assert(out(0)._4 == 0.333333) // 4/12
    assert(out(2)._5 == 0.666667) // (4+2+2)/12 — denominator is N
    // the plan ranks through TakeOrdered, not a global sort
    val plan = TextAnalysis.vocabStats(df, "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("pmiBigrams scores collocations above chance pairs and " +
      "respects minCount") {
    // "new york" always adjacent; "the" pairs with everything
    val df = Seq(
      "new york is big", "new york is old", "new york stays new york",
      "the cat the dog the fish").toDF("text")
    val out = TextAnalysis.pmiBigrams(df, "text", minCount = 2, k = 5)
      .as[(String, String, Long, Double)].collect().toSeq
    val top = out.head
    assert((top._1, top._2) == ("new", "york"), out.toString)
    assert(top._3 == 4L)
    assert(top._4 > 0.0)
    // every returned bigram met minCount
    assert(out.forall(_._3 >= 2L))
    // a bigram seen once never surfaces
    assert(!out.exists(p => p._1 == "is" && p._2 == "big"))
  }

  test("pmiBigrams ignores null-text rows instead of letting " +
      "size(null) = -1 deflate the corpus token count") {
    val clean = Seq("new york is big", "new york is old",
      "new york wins again").toDF("text")
    val withNulls = (Seq(Some("new york is big"),
      Some("new york is old"), Some("new york wins again")) ++
      Seq.fill(5)(Option.empty[String])).toDF("text")
    val a = TextAnalysis.pmiBigrams(clean, "text", 2, 5)
      .as[(String, String, Long, Double)].collect().toSeq
    val b = TextAnalysis.pmiBigrams(withNulls, "text", 2, 5)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
