package graft.analysis

import scala.util.Random

import graft.SparkSpec

class ChangePointSpec extends SparkSpec {
  import spark.implicits._

  private def run(xs: Seq[Double], slack: Double, h: Double,
      target: Option[Double] = None) =
    ChangePoint.cusum(
      xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
        .toDF("k", "b", "x"),
      Seq("k"), "b", "x", slack, h, target)
      .orderBy("b")
      .select("b", "s_pos", "s_neg", "alarm")
      .as[(Long, Double, Double, Long)].collect().toSeq

  private def reference(xs: Seq[Double], mu: Double, k: Double,
      h: Double): Seq[(Double, Double, Long)] = {
    var sp = 0.0; var sn = 0.0
    xs.map { x =>
      sp = math.max(0.0, sp + (x - mu - k))
      sn = math.max(0.0, sn + (mu - x - k))
      (sp, sn, if (sp > h || sn > h) 1L else 0L)
    }
  }

  test("hand case: sustained shift accumulates, spike is absorbed") {
    // target 10, slack 1, threshold 3: a single spike to 13 adds 2 and
    // decays; a sustained shift to 12 adds 1 per step and alarms at
    // the 4th shifted point
    val xs = Seq(10.0, 13.0, 10.0, 10.0, 12.0, 12.0, 12.0, 12.0)
    val got = run(xs, 1.0, 3.0, Some(10.0))
    assert(got.map(_._4) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    // the spike's s_pos = 2, decayed to 1 then 0
    assert(got(1)._2 == 2.0 && got(2)._2 == 1.0 && got(3)._2 == 0.0)
  }

  test("two-sided: a downward shift trips s_neg") {
    val xs = Seq(10.0, 10.0, 7.0, 7.0, 7.0)
    val got = run(xs, 1.0, 3.0, Some(10.0))
    assert(got.map(_._3) == Seq(0.0, 0.0, 2.0, 4.0, 6.0))
    assert(got.map(_._4) == Seq(0L, 0L, 0L, 1L, 1L))
  }

  test("self-calibrating target uses the series mean") {
    val xs = Seq(1.0, 2.0, 3.0)
    val got = run(xs, 0.0, 100.0)
    val mu = 2.0
    assert(got.map(t => (t._2, t._3)) ==
      reference(xs, mu, 0.0, 100.0).map(t => (t._1, t._2)))
  }

  test("fuzz: distributed fold equals the sequential recursion") {
    val rnd = new Random(11)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(60)
      val xs = Seq.fill(n)(rnd.nextInt(100).toDouble)
      val k = rnd.nextInt(3).toDouble
      val h = (5 + rnd.nextInt(50)).toDouble
      val mu = 50.0
      val got = run(xs, k, h, Some(mu))
      val want = reference(xs, mu, k, h)
      assert(got.map(t => (t._2, t._3, t._4)) == want, s"trial=$trial")
    }
  }

  test("series are independent") {
    val df = Seq(("a", 0L, 100.0), ("a", 1L, 100.0),
      ("b", 0L, 1.0), ("b", 1L, 1.0)).toDF("k", "b", "x")
    val got = ChangePoint.cusum(df, Seq("k"), "b", "x", 0.0, 10.0,
      Some(50.0))
      .select("k", "b", "s_pos", "s_neg")
      .as[(String, Long, Double, Double)].collect().toSet
    assert(got == Set(("a", 0L, 50.0, 0.0), ("a", 1L, 100.0, 0.0),
      ("b", 0L, 0.0, 49.0), ("b", 1L, 0.0, 98.0)))
  }

  // ------------------------------------------------------- EWMA chart

  private def runEwma(xs: Seq[Double], lambda: Double, width: Double,
      target: Option[Double] = None, sigma: Option[Double] = None) =
    ChangePoint.ewmaChart(
      xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
        .toDF("k", "b", "x"),
      Seq("k"), "b", "x", lambda, width, target, sigma)
      .orderBy("b")
      .select("b", "z", "ucl", "lcl", "alarm")
      .as[(Long, Double, Double, Double, Long)].collect().toSeq

  private def referenceEwma(xs: Seq[Double], lambda: Double,
      width: Double, mu: Double, sd: Double)
      : Seq[(Double, Double, Double, Long)] = {
    var z = mu
    xs.zipWithIndex.map { case (x, i) =>
      z = lambda * x + (1.0 - lambda) * z
      val hw = width * sd * math.sqrt(lambda / (2.0 - lambda) *
        (1.0 - math.pow(1.0 - lambda, (i + 1) * 2.0)))
      (z, mu + hw, mu - hw, if (z > mu + hw || z < mu - hw) 1L else 0L)
    }
  }

  test("ewma hand case: λ=0.5 halves toward each sample, band warms up") {
    // target 10, σ 1, L 3: z walks 10 → 11 → 11.5 on sustained 12s
    val got = runEwma(Seq(12.0, 12.0, 12.0), 0.5, 3.0,
      Some(10.0), Some(1.0))
    assert(got.map(_._2) == Seq(11.0, 11.5, 11.75))
    // warm-up: hw_t = 3·sqrt(1/3·(1−4^{−t})) grows toward 3·sqrt(1/3):
    // 1.5, ~1.677, ~1.718 — z crosses the widening band only at t=3
    // (11.75 > 11.718…)
    val hw1 = 3.0 * math.sqrt((0.5 / 1.5) * (1.0 - 0.25))
    assert(math.abs(got(0)._3 - (10.0 + hw1)) < 1e-12 && hw1 == 1.5)
    assert(got(0)._3 < got(1)._3 && got(1)._3 < got(2)._3)
    assert(got.map(_._5) == Seq(0L, 0L, 1L))
  }

  test("ewma absorbs a one-off spike that would trip a fixed band") {
    // λ=0.2 damps a lone 20 to z=12: inside 10 ± 3·σ(=2)·warmup? hw_1 =
    // 6·sqrt(1/9·(1−0.64)) = 1.2 — 12 > 11.2 alarms; the NEXT point
    // decays z to 11.6 while the band widens to 1.536+10 — still out,
    // then back in by t=4
    val got = runEwma(Seq(20.0, 10.0, 10.0, 10.0, 10.0), 0.2, 3.0,
      Some(10.0), Some(2.0))
    val want = referenceEwma(Seq(20.0, 10.0, 10.0, 10.0, 10.0),
      0.2, 3.0, 10.0, 2.0)
    assert(got.map(t => (t._2, t._3, t._4, t._5)) == want)
    assert(got.head._5 == 1L && got.last._5 == 0L)
  }

  test("ewma fuzz: distributed fold equals the sequential recursion") {
    val rnd = new Random(23)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(60)
      val xs = Seq.fill(n)(rnd.nextInt(100).toDouble)
      val lambda = Seq(0.1, 0.25, 0.5, 1.0)(rnd.nextInt(4))
      val got = runEwma(xs, lambda, 3.0, Some(50.0), Some(10.0))
      val want = referenceEwma(xs, lambda, 3.0, 50.0, 10.0)
      assert(got.map(t => (t._2, t._3, t._4, t._5)) == want,
        s"trial=$trial")
    }
  }

  test("ewma self-calibration uses series mean and population stddev") {
    val xs = Seq(1.0, 2.0, 3.0)
    val got = runEwma(xs, 0.5, 3.0)
    val mu = 2.0
    val sd = math.sqrt(2.0 / 3.0)
    val want = referenceEwma(xs, 0.5, 3.0, mu, sd)
    // self-calibrated mean/σ are float-order-dependent — compare loosely
    got.map(t => (t._2, t._3, t._4)).zip(want.map(t => (t._1, t._2, t._3)))
      .foreach { case ((gz, gu, gl), (wz, wu, wl)) =>
        assert(math.abs(gz - wz) < 1e-9)
        assert(math.abs(gu - wu) < 1e-9)
        assert(math.abs(gl - wl) < 1e-9)
      }
    // λ=1 degenerates to the raw series (no memory)
    val raw = runEwma(xs, 1.0, 3.0, Some(0.0), Some(1.0))
    assert(raw.map(_._2) == xs)
  }

  test("ewma null sample holds z; detection resumes afterwards") {
    // [10, null, 50] at target 10 / σ 1: the null must not poison the
    // trajectory — z holds at its previous value, and the x=50
    // excursion after it still alarms
    val df = Seq(("s", 0L, Some(10.0)), ("s", 1L, None),
      ("s", 2L, Some(50.0))).toDF("k", "b", "x")
    val out = ChangePoint.ewmaChart(df, Seq("k"), "b", "x",
        lambda = 0.5, width = 3.0, target = Some(10.0),
        sigma = Some(1.0))
      .orderBy("b").select("z", "alarm")
      .as[(Double, Long)].collect().toSeq
    assert(out(0) == ((10.0, 0L)))
    assert(out(1) == ((10.0, 0L))) // held, not null
    assert(out(2)._1 == 30.0 && out(2)._2 == 1L)
  }

  test("ewma degenerate series (self-calibrated σ = 0 or a single " +
      "point) answer null band and alarm, not an everything-alarms " +
      "zero-width band") {
    // constant series: stddev_pop = 0 under self-calibration
    val const = Seq(("c", 0L, 5.0), ("c", 1L, 5.0), ("c", 2L, 5.0))
      .toDF("k", "b", "x")
    val out = ChangePoint.ewmaChart(const, Seq("k"), "b", "x")
      .orderBy("b").collect()
    assert(out.forall(r => r.isNullAt(r.fieldIndex("ucl")) &&
      r.isNullAt(r.fieldIndex("lcl")) &&
      r.isNullAt(r.fieldIndex("alarm"))), out.mkString("; "))
    // the z trajectory itself still computes
    assert(out.forall(_.getAs[Double]("z") == 5.0))
    // single-point series: no dispersion signal either
    val single = Seq(("s", 0L, 42.0)).toDF("k", "b", "x")
    val s = ChangePoint.ewmaChart(single, Seq("k"), "b", "x").collect()
    assert(s.length == 1 && s.head.isNullAt(s.head.fieldIndex("alarm")))
    // an explicit pinned sigma keeps the band even on constant data
    val pinned = ChangePoint.ewmaChart(const, Seq("k"), "b", "x",
      sigma = Some(1.0)).collect()
    assert(pinned.forall(!_.isNullAt(pinned.head.fieldIndex("alarm"))))
    // and an explicit zero sigma is refused loudly
    intercept[IllegalArgumentException] {
      ChangePoint.ewmaChart(const, Seq("k"), "b", "x",
        sigma = Some(0.0))
    }
  }
}
