package graft.metrics

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Exp-histogram pipelines vs an independent scalar oracle (the reference
  * has only example-based coverage here — SURVEY §7.3 risk #1). */
class ExpHistogramSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  // (MetricName, TimeUnix, StartTimeUnix, Temporality, Scale, Count,
  //  ZeroCount, PosOffset, PosCounts, NegOffset, NegCounts, Attributes)
  private type Row = (String, Timestamp, Timestamp, Int, Int, Long, Long,
    Int, Seq[Long], Int, Seq[Long], Map[String, String])

  private def expDf(rows: Seq[Row]): DataFrame =
    rows.toDF("MetricName", "TimeUnix", "StartTimeUnix",
      "AggregationTemporality", "Scale", "Count", "ZeroCount",
      "PositiveOffset", "PositiveBucketCounts", "NegativeOffset",
      "NegativeBucketCounts", "Attributes")

  /** Scalar oracle for the rank-selection + log-linear interpolation
    * (independent re-implementation of histogram.ts:604-660). */
  private def oracle(scale: Int, zero: Long, pos: Map[Long, Long],
      neg: Map[Long, Long], level: Double): Option[Double] = {
    val negSorted = neg.toSeq.sortBy(_._1)
    val posSorted = pos.toSeq.sortBy(_._1)
    val idxs = negSorted.map(_._1).reverse ++ Seq(0L) ++ posSorted.map(_._1)
    val cnts = negSorted.map(_._2).reverse ++ Seq(zero) ++
      posSorted.map(_._2)
    val cum = cnts.map(_.toDouble).scanLeft(0.0)(_ + _).tail
    val total = cum.lastOption.getOrElse(0.0)
    if (total <= 0) return None
    val rank = level * total
    val sel0 = cum.zip(cnts).indexWhere { case (c, b) => b > 0 && c >= rank }
    if (sel0 < 0) return None
    val side = Integer.signum(sel0 - negSorted.size)
    val idx = idxs(sel0)
    val prevCum = if (sel0 == 0) 0.0 else cum(sel0 - 1)
    val frac = (rank - prevCum) / cnts(sel0)
    val w = math.pow(2, -scale)
    Some(
      if (side < 0) -math.pow(2, (idx + 1 - frac) * w)
      else if (side > 0) math.pow(2, (idx + frac) * w)
      else 0.0)
  }

  private def runQuantile(df: DataFrame, level: Double): Seq[Double] =
    ExpHistograms.quantile(df, level, 60)
      .orderBy("__time_bucket").select("value").as[Double].collect().toSeq

  test("count: exp-histogram reset rules") {
    val none = Map.empty[String, String]
    val df = expDf(Seq(
      // first cumulative point → 0
      ("m", t(0), t(0), 2, 0, 10L, 0L, 0, Seq(10L), 0, Nil, none),
      // same start, grew to 16 → +6
      ("m", t(1), t(0), 2, 0, 16L, 0L, 0, Seq(16L), 0, Nil, none),
      // StartTimeUnix changed → take current (4)
      ("m", t(2), t(1), 2, 0, 4L, 0L, 0, Seq(4L), 0, Nil, none)))
    val out = ExpHistograms.count(df, 60).orderBy("__time_bucket")
      .select("count").as[Long].collect().toSeq
    assert(out == Seq(0L, 6L, 4L))
  }

  test("quantile: single delta row, positive buckets only") {
    val none = Map.empty[String, String]
    // scale 0, buckets idx 0..2 = (1,2],(2,4],(4,8] counts 4,3,3
    val df = expDf(Seq(
      ("m", t(0), t(0), 1, 0, 10L, 0L, 0, Seq(4L, 3L, 3L), 0, Nil, none)))
    val got = runQuantile(df, 0.5)
    val want = oracle(0, 0, Map(0L -> 4L, 1L -> 3L, 2L -> 3L),
      Map.empty, 0.5).get
    assert(got.length == 1)
    assert(math.abs(got.head - want) < 1e-9, s"got $got want $want")
  }

  test("quantile: zero bucket and negative buckets order correctly") {
    val none = Map.empty[String, String]
    val df = expDf(Seq(
      ("m", t(0), t(0), 1, 0, 12L, 4L, 0, Seq(4L), 0, Seq(4L), none)))
    // levels hitting negative side, zero, positive side
    val gotLow = runQuantile(df, 0.2).head
    val gotMid = runQuantile(df, 0.5).head
    val gotHigh = runQuantile(df, 0.9).head
    val o = (l: Double) =>
      oracle(0, 4, Map(0L -> 4L), Map(0L -> 4L), l).get
    assert(math.abs(gotLow - o(0.2)) < 1e-9)
    assert(gotLow < 0)
    assert(gotMid == 0.0 && o(0.5) == 0.0)
    assert(math.abs(gotHigh - o(0.9)) < 1e-9)
    assert(gotHigh > 0)
  }

  test("quantile: cumulative series with offset shift and reset") {
    val none = Map.empty[String, String]
    val start = t(0)
    val df = expDf(Seq(
      // first point → zero contribution
      ("m", t(0), start, 2, 0, 5L, 1L, 2, Seq(2L, 2L), 0, Nil, none),
      // window extends left (offset 1), counts grow:
      // prev aligned to cur window [1..3]: [0,2,2]; cur [1,3,4] → deltas
      // (1,1,2), zero +1
      ("m", t(1), start, 2, 0, 10L, 2L, 1, Seq(1L, 3L, 4L), 0, Nil, none),
      // count decreased → reset → take current
      ("m", t(2), start, 2, 0, 3L, 0L, 1, Seq(1L, 1L, 1L), 0, Nil, none)))
    val got = runQuantile(df, 0.5)
    // minute 0 filtered (total 0); minute 1: zero=1? zc delta = 2-1 = 1,
    // pos deltas idx1..3 = (1,1,2); minute 2: current (1,1,1), zero 0
    val want1 = oracle(0, 1, Map(1L -> 1L, 2L -> 1L, 3L -> 2L),
      Map.empty, 0.5).get
    val want2 = oracle(0, 0, Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      Map.empty, 0.5).get
    assert(got.length == 2)
    assert(math.abs(got(0) - want1) < 1e-9, s"got ${got(0)} want $want1")
    assert(math.abs(got(1) - want2) < 1e-9, s"got ${got(1)} want $want2")
  }

  test("quantile: mixed scales normalize to min scale before merging") {
    val a = Map("h" -> "a"); val b = Map("h" -> "b")
    // series a at scale 2: indexes 4..7 (one scale-0 bucket = 4 buckets)
    // → downscaled to scale 0: idx 1 gets 1+2+3+4=10
    val df = expDf(Seq(
      ("m", t(0), t(0), 1, 2, 10L, 0L, 4, Seq(1L, 2L, 3L, 4L), 0, Nil, a),
      // series b at scale 0: idx 1 count 10
      ("m", t(0), t(0), 1, 0, 10L, 0L, 1, Seq(10L), 0, Nil, b)))
    val got = runQuantile(df, 0.5)
    val want = oracle(0, 0, Map(1L -> 20L), Map.empty, 0.5).get
    assert(got.length == 1)
    assert(math.abs(got.head - want) < 1e-9, s"got $got want $want")
  }

  test("quantile: randomized delta rows vs oracle (seeded)") {
    val rnd = new scala.util.Random(7)
    val none = Map.empty[String, String]
    (0 until 10).foreach { trial =>
      val zero = rnd.nextInt(5).toLong
      val posOff = rnd.nextInt(5) - 2
      val pos = Seq.fill(rnd.nextInt(4) + 1)(rnd.nextInt(10).toLong)
      val negOff = rnd.nextInt(3)
      val neg = Seq.fill(rnd.nextInt(3))(rnd.nextInt(10).toLong)
      val level = 0.05 + rnd.nextDouble() * 0.9
      val total = zero + pos.sum + neg.sum
      if (total > 0) {
        val df = expDf(Seq(("m", t(0), t(0), 1, 1, total, zero, posOff,
          pos, negOff, neg, none)))
        val got = runQuantile(df, level)
        val want = oracle(1, zero,
          pos.zipWithIndex.map { case (c, i) => (posOff + i).toLong -> c }
            .filter(_._2 > 0).toMap,
          neg.zipWithIndex.map { case (c, i) => (negOff + i).toLong -> c }
            .filter(_._2 > 0).toMap,
          level)
        want match {
          case Some(w) =>
            assert(got.nonEmpty && math.abs(got.head - w) < 1e-9,
              s"trial $trial: got $got want $w (zero=$zero pos=$pos " +
                s"posOff=$posOff neg=$neg negOff=$negOff level=$level)")
          case None => assert(got.isEmpty)
        }
      }
    }
  }

  private def runFraction(df: DataFrame, lo: Double, hi: Double)
      : Seq[Double] =
    ExpHistograms.fraction(df, lo, hi, 60)
      .orderBy("__time_bucket").select("value").as[Double].collect().toSeq

  test("fraction: hand-computed CDF over mixed-sign buckets") {
    val none = Map.empty[String, String]
    // scale 0: pos buckets (1,2]=1 (2,4]=2 (4,8]=1, zero=1, neg [-2,-1)=1
    val df = expDf(Seq(("m", t(0), t(0), 1, 0, 6L, 1L, 0,
      Seq(1L, 2L, 1L), 0, Seq(1L), none)))
    // F(3) = 1(neg) + 1(zero) + 1(b0) + (log2 3 − 1)·2; F(0) = 2
    val in03 = (1.0 + (math.log(3) / math.log(2) - 1) * 2) / 6
    assert(math.abs(runFraction(df, 0, 3).head - in03) < 1e-12)
    // boundary-aligned bounds are exact: (2,8] = buckets b1+b2 = 3/6
    assert(runFraction(df, 2, 8).head == 0.5)
    // (−2, 0] = whole neg bucket + zero bucket = 2/6
    assert(math.abs(runFraction(df, -2, 0).head - 2.0 / 6) < 1e-12)
    assert(runFraction(df, Double.NegativeInfinity,
      Double.PositiveInfinity).head == 1.0)
    // degenerate upper < lower clamps to 0
    assert(runFraction(df, 8, 2).head == 0.0)
  }

  test("fraction inverts quantile: fraction(-Inf, q(φ)) = φ") {
    val none = Map.empty[String, String]
    val df = expDf(Seq(("m", t(0), t(0), 1, 2, 9L, 2L, -3,
      Seq(1L, 0L, 3L, 1L), 1, Seq(1L, 1L), none)))
    // φ chosen so the rank lands in nonzero-width buckets: inside the
    // zero bucket (φ ∈ (2/9, 4/9]) the quantile collapses to 0 and the
    // CDF there is a step, so the identity cannot hold
    Seq(0.1, 0.2, 0.5, 0.9).foreach { phi =>
      val q = runQuantile(df, phi).head
      val frac = runFraction(df, Double.NegativeInfinity, q).head
      assert(math.abs(frac - phi) < 1e-9, s"phi=$phi q=$q frac=$frac")
    }
  }
}
