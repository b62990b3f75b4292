package graft.analysis

import graft.SparkSpec

class CorrelationSpec extends SparkSpec {
  import spark.implicits._

  test("spearmanPairs: perfect monotone (nonlinear) association " +
      "scores 1, reversal scores -1, and ties average ranks") {
    // b follows a monotonically but nonlinearly (a², where Pearson
    // would be < 1); c is a's exact reversal
    val df = (1 to 8).flatMap { t =>
      Seq(("a", t.toLong, t.toDouble), ("b", t.toLong, (t * t).toDouble),
        ("c", t.toLong, (9 - t).toDouble))
    }.toDF("k", "b", "x")
    val out = Correlation.spearmanPairs(df, "k", "b", "x")
      .orderBy("key_a", "key_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out.map(t => (t._1, t._2, t._3)) ==
      Seq(("a", "b", 8L), ("a", "c", 8L), ("b", "c", 8L)))
    assert(out(0)._4 == 1.0)  // monotone up
    assert(out(1)._4 == -1.0) // exact reversal
    assert(out(2)._4 == -1.0)
    // ties: series d constant → every rank ties to the average; d²
    // against itself ... vs a: Σd² fixed by the tie-averaged ranks
    val tied = ((1 to 4).map(t => ("a", t.toLong, t.toDouble)) ++
      (1 to 4).map(t => ("d", t.toLong, 7.0))).toDF("k", "b", "x")
    val td = Correlation.spearmanPairs(tied, "k", "b", "x")
      .as[(String, String, Long, Double)].collect().head
    // d's ranks are all 2.5; a's are 1..4 → Σd² = 2.25+0.25+0.25+2.25
    // = 5 → rho = 1 − 30/60 = 0.5 (the formula's documented tie
    // convention, deterministic across partitionings)
    assert(td._4 == 0.5)
    // maxSeries guard is loud
    val many = (1 to 20).flatMap(k =>
      (1 to 3).map(t => (s"k$k", t.toLong, t.toDouble)))
      .toDF("k", "b", "x")
    val e = intercept[IllegalArgumentException] {
      Correlation.spearmanPairs(many, "k", "b", "x", maxSeries = 10)
    }
    assert(e.getMessage.contains("maxSeries"))
  }
}
