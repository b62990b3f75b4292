package graft.analysis

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DownsampleSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("m4 keeps first/last/min/max per pixel, ties broken by id") {
    // 2 pixels over [0, 100): bucket width 50
    val df = Seq(
      (t(10), 1L, 5.0), (t(20), 2L, 9.0), (t(30), 3L, 1.0), (t(40), 4L, 7.0),
      (t(60), 5L, 4.0), (t(60), 6L, 2.0), // tie: id decides first/last
      (t(200), 7L, 99.0) // outside [0, 100): dropped
    ).toDF("ts", "id", "v").withColumn("s", lit("a"))
    val out = Downsample.m4(df, Seq("s"), "ts", "v", "id", 0L, 100L, 2)
      .orderBy("pixel")
      .select("pixel", "n", "first_v", "last_v", "min_v", "max_v")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 4L, 5.0, 7.0, 1.0, 9.0),
      (1L, 2L, 4.0, 2.0, 2.0, 4.0)))
  }

  /** The thesis pseudocode (Steinarsson 2013, §4.2), written in its own
    * index convention as an independent check on lttbKernel. */
  private def lttbReference(pts: Array[(Double, Double)],
      threshold: Int): Array[(Double, Double)] = {
    val n = pts.length
    if (threshold >= n || threshold < 3) return pts
    val every = (n - 2).toDouble / (threshold - 2)
    val out = Array.newBuilder[(Double, Double)]
    var a = 0
    out += pts(0)
    for (i <- 0 until threshold - 2) {
      var (avgX, avgY) = (0.0, 0.0)
      var s = math.floor((i + 1) * every).toInt + 1
      val e = math.min(math.floor((i + 2) * every).toInt + 1, n)
      val m = math.max(e - s, 1)
      val s0 = math.min(s, n - 1)
      s = s0
      while (s < s0 + m && s < n) { avgX += pts(s)._1; avgY += pts(s)._2; s += 1 }
      avgX /= m; avgY /= m
      val ro = math.floor(i * every).toInt + 1
      val rt = math.floor((i + 1) * every).toInt + 1
      var maxArea = -1.0
      var next = ro
      for (j <- ro until rt) {
        val area = math.abs(
          (pts(a)._1 - avgX) * (pts(j)._2 - pts(a)._2) -
            (pts(a)._1 - pts(j)._1) * (avgY - pts(a)._2)) / 2.0
        if (area > maxArea) { maxArea = area; next = j }
      }
      out += pts(next)
      a = next
    }
    out += pts(n - 1)
    out.result()
  }

  test("lttbKernel matches the thesis pseudocode on fuzzed series") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val n = 10 + rnd.nextInt(400)
      val threshold = 3 + rnd.nextInt(math.max(n - 3, 1))
      val pts = Array.tabulate(n)(i =>
        (i * 10.0, math.floor(rnd.nextDouble() * 1000)))
      val got = Downsample.lttbKernel(pts, threshold)
      val want = lttbReference(pts, threshold)
      assert(got.toSeq == want.toSeq,
        s"trial $trial n=$n threshold=$threshold")
      assert(got.length == math.min(threshold, n))
      assert(got.head == pts.head && got.last == pts.last)
    }
  }

  test("lttbKernel picks the visually dominant spike by hand") {
    // 5 points, threshold 3: one interior bucket [1, 4) vs the last
    // point as centroid; the spike at x=20 dominates the flat points
    val pts = Array((0.0, 0.0), (10.0, 1.0), (20.0, 100.0), (30.0, 1.0),
      (40.0, 0.0))
    val got = Downsample.lttbKernel(pts, 3)
    assert(got.toSeq == Seq((0.0, 0.0), (20.0, 100.0), (40.0, 0.0)))
  }

  test("lttb over a DataFrame explodes kept points per series in order") {
    val rows = (0 until 100).flatMap { i =>
      Seq(("a", t(i * 60), (i % 13).toDouble), ("b", t(i * 60), i.toDouble))
    }
    val df = rows.toDF("s", "ts", "v")
    val out = Downsample.lttb(df, Seq("s"), "ts", "v", 0L, 6001L, 10)
    val byS = out.select("s", "idx", "t", "v")
      .as[(String, Int, Double, Double)].collect().groupBy(_._1)
    assert(byS("a").length == 10 && byS("b").length == 10)
    // kept points are in time order and bracket the series
    val aPts = byS("a").sortBy(_._2).map(_._3)
    assert(aPts.head == 0.0 && aPts.last == 99 * 60.0)
    assert(aPts.sameElements(aPts.sorted))
    // deterministic
    val again = Downsample.lttb(df, Seq("s"), "ts", "v", 0L, 6001L, 10)
      .select("s", "idx", "t", "v")
      .as[(String, Int, Double, Double)].collect().toSet
    assert(again == out.select("s", "idx", "t", "v")
      .as[(String, Int, Double, Double)].collect().toSet)
  }
}
