package graft.analysis

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers flags a spike a mean/stddev band would let " +
      "inflate itself away; degenerate (MAD = 0) series answer null") {
    // 11 near-constant points + one 100x spike
    val df = ((1 to 11).map(t => ("s", t.toLong, 10.0 + (t % 3))) :+
      (("s", 12L, 1000.0))).toDF("k", "b", "x")
    val out = Robust.madOutliers(df, Seq("k"), "b", "x", k = 3.5)
      .orderBy("b").collect()
    val spike = out.last
    assert(spike.getLong(spike.fieldIndex("outlier")) == 1L)
    // every calm point stays in-band
    assert(out.init.forall(r => r.getLong(r.fieldIndex("outlier")) == 0L))
    // median/MAD are robust: the spike does not drag the center
    assert(spike.getDouble(spike.fieldIndex("med")) <= 12.0)
    // constant series: MAD = 0 → no dispersion signal, null verdicts
    val const = (1 to 6).map(t => ("c", t.toLong, 5.0)).toDF("k", "b", "x")
    val c = Robust.madOutliers(const, Seq("k"), "b", "x").collect()
    assert(c.forall(r => r.isNullAt(r.fieldIndex("robust_z")) &&
      r.isNullAt(r.fieldIndex("outlier"))))
    assert(c.forall(r => r.getDouble(r.fieldIndex("med")) == 5.0))
  }

  test("winsorize: percentile_disc bounds are observed values, " +
      "clamping is exact, and groups get independent bounds") {
    val df = ((1 to 10).map(v => ("g1", v.toDouble)) ++
      Seq(("g2", 100.0), ("g2", 200.0), ("g2", 300.0)))
      .toDF("k", "x")
    val out = Robust.winsorize(df, Seq("k"), "x", 0.1, 0.9)
      .orderBy("k", "v").collect()
    val g1 = out.filter(_.getString(0) == "g1")
    // ladder over 1..10: frac(v) = v/10 → lo = 1 (first ≥ 0.1),
    // hi = 9 (first ≥ 0.9); 10 clamps to 9
    assert(g1.forall(r => r.getDouble(r.fieldIndex("lo")) == 1.0 &&
      r.getDouble(r.fieldIndex("hi")) == 9.0))
    assert(g1.last.getDouble(g1.last.fieldIndex("v_wins")) == 9.0)
    assert(g1.map(_.getAs[Double]("v_wins")).sum == 54.0) // 45−10+9... 1..9 + 9
    val g2 = out.filter(_.getString(0) == "g2")
    // 3 values: fracs 1/3, 2/3, 1 → lo = 100, hi = 300
    assert(g2.forall(r => r.getAs[Double]("lo") == 100.0 &&
      r.getAs[Double]("hi") == 300.0))
    assert(g2.map(_.getAs[Double]("v_wins")).toSeq ==
      Seq(100.0, 200.0, 300.0))
  }
}
