package graft.analysis

import graft.SparkSpec

class ConcentrationSpec extends SparkSpec {
  import spark.implicits._

  test("gini: equal weights give 0, a hand-computed skew matches the " +
      "discrete formula, and top_share reads the heaviest group") {
    val eq = Seq(("en", "a"), ("en", "b"), ("en", "c"), ("en", "d"))
      .toDF("lang", "src")
    val g0 = Concentration.gini(eq, Seq("lang"), "src")
      .collect().head
    assert(g0.getAs[Double]("gini") == 0.0)
    assert(g0.getAs[Double]("top_share") == 0.25)
    // weights 1,1,2 ranked ascending: G = 2(1·1+2·1+3·2)/(3·4) − 4/3
    val sk = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c"))
      .map(("en", _)).toDF("lang", "src")
    val g1 = Concentration.gini(sk, Seq("lang"), "src")
      .collect().head
    assert(g1.getAs[Double]("gini") == 0.166667)
    assert(g1.getAs[Double]("top_share") == 0.5)
    assert(g1.getAs[Long]("n_groups") == 3L &&
      g1.getAs[Long]("total") == 4L)
    // weight column variant: token-weighted concentration
    val w = Seq(("en", "a", 10L), ("en", "b", 10L)).toDF(
      "lang", "src", "toks")
    val g2 = Concentration.gini(w, Seq("lang"), "src", Some("toks"))
      .collect().head
    assert(g2.getAs[Double]("gini") == 0.0 &&
      g2.getAs[Long]("total") == 20L)
  }

  test("gini: fractional weights sum at full precision — 0.4 is not " +
      "rounded to 0 per row") {
    // two groups with weights 0.4 and 0.4: perfectly equal → gini 0,
    // top_share 0.5. A per-row decimal(38,0) cast would HALF_UP both
    // to 0 and answer NaN/garbage instead.
    val w = Seq(("en", "a", 0.4), ("en", "b", 0.4))
      .toDF("lang", "src", "w")
    val g = Concentration.gini(w, Seq("lang"), "src", Some("w"))
      .collect().head
    assert(g.getAs[Double]("gini") == 0.0)
    assert(g.getAs[Double]("top_share") == 0.5)
    // total reports the nearest integer of the exact 0.8 sum
    assert(g.getAs[Long]("total") == 1L)
    // skewed fractional weights 0.5, 1.5 → same gini as 1, 3:
    // G = 2(1·0.5+2·1.5)/(2·2) − 3/2 = 0.25
    val sk = Seq(("en", "a", 0.5), ("en", "b", 1.5))
      .toDF("lang", "src", "w")
    val gs = Concentration.gini(sk, Seq("lang"), "src", Some("w"))
      .collect().head
    assert(gs.getAs[Double]("gini") == 0.25)
    assert(gs.getAs[Double]("top_share") == 0.75)
  }
}
