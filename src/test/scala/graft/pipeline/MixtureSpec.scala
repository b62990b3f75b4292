package graft.pipeline

import graft.SparkSpec

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("mixtureDiversity: uniform mix maximizes entropy (exp(H) = " +
      "source count), a dominated mix collapses it, and null groups " +
      "surface as their own row") {
    val uniform = (1 to 300).map(i => s"s${i % 3}").toDF("src")
    val u = TextAnalysis.mixtureDiversity(uniform, Seq("src"))
      .collect()
    assert(u.length == 3)
    assert(u.forall(r =>
      r.getDouble(r.fieldIndex("share")) == 1.0 / 3 ||
        math.abs(r.getDouble(r.fieldIndex("share")) - 0.333333) < 1e-9))
    val hU = u.map(r => r.getDouble(r.fieldIndex("entropy_term"))).sum
    assert(math.abs(math.exp(hU) - 3.0) < 0.01, s"effective $hU")
    // 98/1/1: effective source count collapses toward 1
    val skew = (Seq.fill(98)("a") ++ Seq("b", "c")).toDF("src")
    val hS = TextAnalysis.mixtureDiversity(skew, Seq("src"))
      .collect().map(r => r.getDouble(r.fieldIndex("entropy_term")))
      .sum
    assert(math.exp(hS) < 1.2, s"effective ${math.exp(hS)}")
    // null keys are a finding, not a drop
    val withNull = Seq(Some("a"), Some("a"), None).toDF("src")
    val n = TextAnalysis.mixtureDiversity(withNull, Seq("src"))
      .collect()
    assert(n.length == 2)
    assert(n.exists(r => r.isNullAt(0) &&
      r.getLong(r.fieldIndex("n")) == 1L))
  }
}
