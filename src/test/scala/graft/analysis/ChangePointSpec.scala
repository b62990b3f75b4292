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
}
