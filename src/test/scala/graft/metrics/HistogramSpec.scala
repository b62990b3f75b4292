package graft.metrics

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Histogram count/quantile pipeline vs an independent scalar oracle.
  * Scenarios per FIXTURES.md §4: resets (take-current rule), delta vs
  * cumulative temporality, multi-series merging. */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private def histDf(rows: Seq[(String, String, Timestamp, Int, Long,
      Seq[Long], Seq[Double], Map[String, String])]): DataFrame =
    rows.toDF("MetricName", "ServiceName", "TimeUnix",
      "AggregationTemporality", "Count", "BucketCounts", "ExplicitBounds",
      "Attributes")

  /** Scalar oracle: linear-interpolated quantile from per-bucket deltas —
    * independent re-implementation of the reference's stage-3 math
    * (histogram.ts:205-250). */
  private def quantileOracle(bounds: Seq[Double], counts: Seq[Double],
      level: Double): Option[Double] = {
    val cum = counts.scanLeft(0.0)(_ + _).tail
    val n = cum.length
    if (n <= 1) return None
    val total = cum.last
    if (total <= 0) return None
    val rank = level * total
    val ui0 = cum.indexWhere(_ > rank) + 1 // 1-based; 0 if none
    val upperIdx = if (ui0 == 0) n else ui0
    val upperCount = cum(upperIdx - 1)
    val upperBound =
      if (upperIdx <= bounds.length) bounds(upperIdx - 1)
      else Double.PositiveInfinity
    val lowerBound =
      if (upperIdx > 1) bounds(upperIdx - 2)
      else if (upperBound > 0) 0.0
      else Double.PositiveInfinity
    val lowerCount =
      if (lowerBound == 0.0) 0.0
      else if (upperIdx > 1) cum(upperIdx - 2)
      else 0.0
    Some(
      if (upperBound.isPosInfinity) bounds.last
      else if (lowerBound.isPosInfinity) bounds.head
      else if (upperCount == lowerCount) lowerBound
      else lowerBound + (upperBound - lowerBound) *
        ((rank - lowerCount) / (upperCount - lowerCount)))
  }

  test("histogram count: cumulative delta with take-current reset rule") {
    val bounds = Seq(1.0, 5.0)
    val df = histDf(Seq(
      ("lat", "s", t(0), 2, 10L, Seq(5L, 3L, 2L), bounds, Map.empty),
      ("lat", "s", t(1), 2, 16L, Seq(8L, 5L, 3L), bounds, Map.empty),
      // reset: 16 -> 4 → delta = 4 (take current, NOT clamp to 0)
      ("lat", "s", t(2), 2, 4L, Seq(2L, 1L, 1L), bounds, Map.empty)))
    val out = Histograms.count(df, 60).orderBy("__time_bucket")
      .select("count").as[Long].collect().toSeq
    assert(out == Seq(0L, 6L, 4L))
  }

  test("histogram quantile: single delta-temporality row interpolates") {
    // bounds [1,5]; counts [5,3,2]: p50 → rank 5, cum=[5,8,10]
    // upper_idx=2 (cum 8>5), bounds: lower=1, upper=5, lower_count=5? no:
    // lower_bound=bounds[0]=1 ≠ 0 → lower_count=cum[0]=5 → interp 1+4*0/3=1
    val df = histDf(Seq(
      ("lat", "s", t(0), 1, 10L, Seq(5L, 3L, 2L), Seq(1.0, 5.0), Map.empty)))
    val out = Histograms.quantile(df, 0.5, 60).select("value")
      .as[Double].collect()
    assert(out.length == 1)
    assert(math.abs(out(0) - quantileOracle(Seq(1.0, 5.0),
      Seq(5, 3, 2), 0.5).get) < 1e-9)
  }

  test("histogram quantile: cumulative series + multi-series merge") {
    val bounds = Seq(10.0, 100.0, 1000.0)
    val a = Map("host" -> "a"); val b = Map("host" -> "b")
    val df = histDf(Seq(
      // series a: first point zeros out, second contributes deltas (3,2,1,0)
      ("lat", "s", t(0), 2, 6L, Seq(1L, 2L, 2L, 1L), bounds, a),
      ("lat", "s", t(1), 2, 12L, Seq(4L, 4L, 3L, 1L), bounds, a),
      // series b delta-temporality contributes directly
      ("lat", "s", t(1), 1, 5L, Seq(0L, 3L, 2L, 0L), bounds, b)))
    // bucket at minute 1 has deltas a=(3,2,1,0) + b=(0,3,2,0) = (3,5,3,0)
    val out = Histograms.quantile(df, 0.5, 60)
      .orderBy("__time_bucket").select("value").as[Double].collect()
    // minute-0 bucket: zeros → filtered (total=0); minute-1: oracle
    assert(out.length == 1)
    val expect = quantileOracle(bounds, Seq(3, 5, 3, 0), 0.5).get
    assert(math.abs(out(0) - expect) < 1e-9)
  }

  test("histogram quantile: randomized cases vs scalar oracle (seeded)") {
    val rnd = new scala.util.Random(42)
    val bounds = Seq(1.0, 10.0, 100.0)
    // batch all cases into ONE frame (distinct metric names) — a single
    // Spark job instead of 20
    val cases = (0 until 20).map { i =>
      val counts = Seq.fill(4)(rnd.nextInt(21).toLong)
      val level = 0.01 + rnd.nextDouble() * 0.98
      (s"m$i", counts, level)
    }.filter(_._2.sum > 0)
    cases.groupBy(_._3).foreach { case (level, cs) =>
      val df = histDf(cs.map { case (name, counts, _) =>
        (name, "s", t(0), 1, counts.sum, counts, bounds,
          Map.empty[String, String])
      })
      val got = Histograms.quantile(df, level, 60)
        .select("MetricName", "value").as[(String, Double)].collect().toMap
      cs.foreach { case (name, counts, _) =>
        val want = quantileOracle(bounds, counts.map(_.toDouble), level).get
        assert(math.abs(got(name) - want) < 1e-9,
          s"$name counts=$counts level=$level got=${got.get(name)} want=$want")
      }
    }
  }

  test("histogram quantile: bounds change treated as take-current") {
    val df = histDf(Seq(
      ("m", "s", t(0), 2, 5L, Seq(2L, 2L, 1L), Seq(1.0, 5.0), Map.empty),
      // bounds change → take current counts as delta
      ("m", "s", t(1), 2, 9L, Seq(3L, 3L, 3L), Seq(2.0, 8.0), Map.empty)))
    val out = Histograms.quantile(df, 0.5, 60).orderBy("__time_bucket")
      .select("value").as[Double].collect()
    // minute 0: first cumulative point → zeros → filtered
    // minute 1: counts (3,3,3) on bounds (2,8): rank 4.5, cum=[3,6,9]
    val expect = quantileOracle(Seq(2.0, 8.0), Seq(3, 3, 3), 0.5).get
    assert(out.length == 1)
    assert(math.abs(out(0) - expect) < 1e-9)
  }
}
