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
}
