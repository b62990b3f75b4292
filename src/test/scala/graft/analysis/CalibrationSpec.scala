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

  test("prCurve: hand-computed sweep — threshold 0 predicts all, " +
      "monotone tp, F1 from one exact division, empty-prediction " +
      "thresholds answer null precision") {
    // 4 samples, bins = 4: scores .1(y0) .3(y1) .6(y1) .9(y0) → P = 2
    val rows = Seq((0.1, 0L), (0.3, 1L), (0.6, 1L), (0.9, 0L))
    val out = Calibration.prCurve(rows.toDF("s", "y"), "s", "y",
        bins = 4)
      .as[(Double, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().toSeq
    // t=0: tp 2 fp 2 fn 0 → p .5 r 1 f1 = 4/(4+2+0) = .666667
    assert(out(0) == (0.0, 2L, 2L, 0L, Some(0.5), Some(1.0),
      Some(0.666667)))
    // t=.25: bucket ≥ 1 → {.3,.6,.9}: tp 2 fp 1 → p .666667 r 1
    assert(out(1) == (0.25, 2L, 1L, 0L, Some(0.666667), Some(1.0),
      Some(0.8)))
    // t=.5: {.6,.9}: tp 1 fp 1 fn 1 → p .5 r .5 f1 .5
    assert(out(2) == (0.5, 1L, 1L, 1L, Some(0.5), Some(0.5),
      Some(0.5)))
    // t=.75: {.9}: tp 0 fp 1 fn 2 → p 0 r 0 f1 0
    assert(out(3) == (0.75, 0L, 1L, 2L, Some(0.0), Some(0.0),
      Some(0.0)))
    // nothing predicted positive → precision null, not 0/0
    val none = Calibration.prCurve(
        Seq((0.1, 1L)).toDF("s", "y"), "s", "y", bins = 2)
      .as[(Double, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().toSeq
    assert(none(1)._5.isEmpty && none(1)._2 == 0L)
  }

  test("auc: perfect separation 1.0, all-tied 0.5, hand-computed 0.75 " +
      "with ties exact, degenerate single-class null, distinct bound " +
      "audited") {
    def a(rows: Seq[(Double, Long)]): Option[Double] =
      Calibration.auc(rows.toDF("s", "y"), "s", "y")
        .as[(Long, Long, Option[Double])].collect().head._3
    assert(a(Seq((0.8, 1L), (0.6, 1L), (0.4, 0L), (0.2, 0L)))
      .contains(1.0))
    assert(a(Seq((0.5, 1L), (0.5, 0L))).contains(0.5))
    // pairs: .9>.6 ✓, .9>.1 ✓, .4<.6 ✗, .4>.1 ✓ → 3/4
    assert(a(Seq((0.9, 1L), (0.4, 1L), (0.6, 0L), (0.1, 0L)))
      .contains(0.75))
    // tie between a positive and a negative counts half:
    // pos {.5}, neg {.5, .1}: (tie → .5) + (.5 > .1 → 1) over 2 = .75
    assert(a(Seq((0.5, 1L), (0.5, 0L), (0.1, 0L))).contains(0.75))
    assert(a(Seq((0.5, 1L), (0.6, 1L))).isEmpty) // no negatives
    val e = intercept[IllegalArgumentException] {
      Calibration.auc(
        (1 to 100).map(i => (i / 100.0, (i % 2).toLong))
          .toDF("s", "y"), "s", "y", maxDistinct = 10L)
    }
    assert(e.getMessage.contains("quantize the score first"))
  }

  test("brier: hand-computed MSE over cells, perfect predictions 0, " +
      "worst-case 1, empty input null") {
    def b(rows: Seq[(Double, Long)]): (Long, Option[Double]) =
      Calibration.brier(rows.toDF("s", "y"), "s", "y")
        .as[(Long, Option[Double])].collect().head
    // ((0.75-1)² + (0.25-0)²) / 2 = (0.0625 + 0.0625)/2 = 0.0625
    assert(b(Seq((0.75, 1L), (0.25, 0L))) == (2L, Some(0.0625)))
    assert(b(Seq((1.0, 1L), (0.0, 0L))) == (2L, Some(0.0)))
    assert(b(Seq((0.0, 1L), (1.0, 0L))) == (2L, Some(1.0)))
    assert(b(Seq((Double.NaN, 1L))) == (0L, None))
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
