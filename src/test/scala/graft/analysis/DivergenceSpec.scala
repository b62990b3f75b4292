package graft.analysis

import graft.SparkSpec

class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("jsdCells: cells match the per-term JSD formula including the " +
      "zero-count group cell and the __other__ tail fold") {
    // g1 = "a a b", g2 = "b b"; corpus a:2 b:3 → top-1 vocab = {b},
    // a folds into __other__. Totals: g1 = 3, g2 = 2, corpus = 5.
    val df = Seq(("g1", "a a b"), ("g2", "b b")).toDF("src", "text")
    val out = Divergence.jsdCells(df, "src", "text", topK = 1)
      .orderBy("src", "term")
      .as[(String, String, Long, Double, Double, Double)]
      .collect().toSeq
    def term(p: Double, q: Double): Double = {
      val m = (p + q) / 2.0
      val l = if (p == 0.0) 0.0 else 0.5 * p * math.log(p / m)
      math.rint((l + 0.5 * q * math.log(q / m)) * 1e6) / 1e6
    }
    assert(out.map(t => (t._1, t._2, t._3)) == Seq(
      ("g1", "__other__", 2L), ("g1", "b", 1L),
      ("g2", "__other__", 0L), ("g2", "b", 2L)))
    val expected = Seq(
      term(2.0 / 3, 2.0 / 5), term(1.0 / 3, 3.0 / 5),
      term(0.0, 2.0 / 5), term(1.0, 3.0 / 5))
    assert(out.map(_._6) == expected, s"${out.map(_._6)} vs $expected")
    // the zero-count cell is PRESENT (q > 0 contributes mass) and its
    // p reads 0
    assert(out(2)._4 == 0.0 && out(2)._5 == 0.4)
  }

  test("jsd: identical distributions answer 0; disjoint supports " +
      "approach ln 2; jsd_norm is the [0,1] scaling") {
    val same = Seq(("g1", "a b"), ("g2", "a b")).toDF("src", "text")
    val s = Divergence.jsd(same, "src", "text", topK = 4)
      .orderBy("src").as[(String, Double, Double)].collect().toSeq
    assert(s.forall(_._2 == 0.0) && s.forall(_._3 == 0.0))
    // fully disjoint vocabularies: each group sees the other's mass
    // only through the mixture — JSD(P‖mix) where mix is 50/50 is
    // bounded by ln 2 and lands close for balanced disjoint groups
    val disj = Seq(("g1", "a a a a"), ("g2", "b b b b"))
      .toDF("src", "text")
    val d = Divergence.jsd(disj, "src", "text", topK = 4)
      .orderBy("src").as[(String, Double, Double)].collect().toSeq
    d.foreach { case (_, j, jn) =>
      assert(j > 0.0 && j <= math.log(2.0) + 1e-9)
      assert(math.abs(jn - j / math.log(2.0)) < 2e-6)
    }
  }
}
