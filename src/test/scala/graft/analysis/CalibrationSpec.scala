package graft.analysis

import graft.SparkSpec

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("reliabilityBins: perfectly calibrated bins report zero gap, " +
      "score 1.0 lands in the top bin, nulls are excluded, and n " +
      "sums to the sample count") {
    // bin [0.2,0.3): conf exactly 0.25, 1 of 4 positive → gap 0
    val rows = Seq.fill(3)((0.25, 0L)) ++ Seq((0.25, 1L)) ++
      // bin [0.8,0.9): conf 0.875, all positive → gap 0.125
      Seq.fill(8)((0.875, 1L)) ++
      Seq((1.0, 1L)) ++                       // clamps into bin 9
      Seq((Double.NaN, 9L))                    // excluded like null
    val df = rows.toDF("s", "y")
    val out = Calibration.reliabilityBins(df, "s", "y", bins = 10)
      .orderBy("bin").collect()
    val byBin = out.map(r => r.getInt(0) -> r).toMap
    assert(byBin(2).getAs[Long]("n") == 4)
    assert(byBin(2).getAs[Double]("mean_conf") == 0.25)
    assert(byBin(2).getAs[Double]("frac_pos") == 0.25)
    assert(byBin(2).getAs[Double]("gap") == 0.0)
    assert(byBin(8).getAs[Double]("gap") == 0.125)
    assert(byBin(9).getAs[Long]("n") == 1) // the clamped 1.0
    assert(out.map(_.getAs[Long]("n")).sum == 13) // NaN row excluded
    // ECE = Σ ece_term is the n-weighted gap
    val ece = out.map(_.getAs[Double]("ece_term")).sum
    assert(math.abs(ece - (8.0 / 13 * 0.125)) < 1e-6)
  }

  test("reliabilityBins: out-of-range scores are excluded, not " +
      "phantom-binned or merged into the top bin") {
    // -0.5 would land in a phantom negative bin; 1.7 would merge
    // into bin 9 and poison its mean_conf — both must be excluded
    val rows = Seq((-0.5, 0L), (1.7, 1L), (0.95, 1L), (0.95, 1L))
    val out = Calibration.reliabilityBins(
        rows.toDF("s", "y"), "s", "y", bins = 10)
      .collect()
    assert(out.length == 1)
    assert(out.head.getInt(0) == 9)
    assert(out.head.getAs[Long]("n") == 2)
    assert(out.head.getAs[Double]("mean_conf") == 0.95)
  }
}
