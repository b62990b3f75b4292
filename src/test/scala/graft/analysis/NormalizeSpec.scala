package graft.analysis

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantileNormalize maps a lenient and a strict grader onto " +
      "the same ladder: equal within-group ranks get equal " +
      "normalized scores, ties take midranks, and the audit is loud") {
    // grader A scores 6..10, grader B scores 1..5 — same ordering,
    // shifted scales. After normalization, A's k-th score and B's
    // k-th score must map to the SAME global value.
    val rows = ((6 to 10).map(v => ("A", v.toDouble)) ++
      (1 to 5).map(v => ("B", v.toDouble))).toDF("g", "s")
    val out = Normalize.quantileNormalize(rows, Seq("g"), "s")
      .orderBy("g", "v").collect()
    val a = out.filter(_.getString(0) == "A")
      .map(r => r.getDouble(r.fieldIndex("qnorm"))).toSeq
    val b = out.filter(_.getString(0) == "B")
      .map(r => r.getDouble(r.fieldIndex("qnorm"))).toSeq
    assert(a == b, s"$a vs $b")
    // monotone: higher raw rank → higher (or equal) normalized value
    assert(a == a.sorted)
    // midrank fraction of the k-th of 5 distinct values: (k−0.5)/5
    val rA = out.filter(_.getString(0) == "A")
      .map(r => r.getDouble(r.fieldIndex("r"))).toSeq
    assert(rA == Seq(0.1, 0.3, 0.5, 0.7, 0.9))
    // percentile_disc: every qnorm is an actually-observed value
    val observed = (1 to 10).map(_.toDouble).toSet
    assert((a ++ b).forall(observed.contains))
    // loud audit
    val wide = (1 to 100).map(v => ("A", v.toDouble)).toDF("g", "s")
    val e = intercept[IllegalArgumentException] {
      Normalize.quantileNormalize(wide, Seq("g"), "s",
        maxDistinct = 10)
    }
    assert(e.getMessage.contains("maxDistinct"))
    // the GLOBAL ladder bound trips even when every group is small:
    // many groups with disjoint values blow up the ladder, not a group
    val manyGroups = (1 to 100)
      .map(v => (s"g${v % 20}", v.toDouble)).toDF("g", "s")
    val e2 = intercept[IllegalArgumentException] {
      Normalize.quantileNormalize(manyGroups, Seq("g"), "s",
        maxDistinct = 10, maxGlobalDistinct = 50)
    }
    assert(e2.getMessage.contains("maxGlobalDistinct"))
    // ties share one cell and one midrank
    val tied = Seq(("A", 1.0), ("A", 1.0), ("A", 2.0)).toDF("g", "s")
    val t = Normalize.quantileNormalize(tied, Seq("g"), "s")
      .orderBy("v").collect()
    assert(t.length == 2)
    assert(t(0).getLong(t(0).fieldIndex("n")) == 2L)
    // midrank of the tie block of 2 in 3 rows: (2 - 1)/3
    assert(math.abs(t(0).getDouble(t(0).fieldIndex("r")) - 1.0 / 3)
      < 1e-6)
  }
}
