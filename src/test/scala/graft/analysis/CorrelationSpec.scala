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
    // a constant series has zero rank variance — Spearman is 0/0
    // there, so the pair answers null rather than a fabricated number
    val tied = ((1 to 4).map(t => ("a", t.toLong, t.toDouble)) ++
      (1 to 4).map(t => ("d", t.toLong, 7.0))).toDF("k", "b", "x")
    val td = Correlation.spearmanPairs(tied, "k", "b", "x").collect().head
    assert(td.getLong(td.fieldIndex("n")) == 4L)
    assert(td.isNullAt(td.fieldIndex("rho")))
    // PARTIAL ties still answer: two tied values average their ranks
    val part = ((1 to 4).map(t => ("a", t.toLong, t.toDouble)) ++
      Seq(("e", 1L, 5.0), ("e", 2L, 5.0), ("e", 3L, 8.0),
        ("e", 4L, 9.0))).toDF("k", "b", "x")
    val pd = Correlation.spearmanPairs(part, "k", "b", "x").collect().head
    // e's ranks: 1.5, 1.5, 3, 4 vs a's 1..4 → Σd² = .25+.25 = .5
    // → rho = 1 − 3/60 = 0.95
    assert(pd.getDouble(pd.fieldIndex("rho")) == 0.95)
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
