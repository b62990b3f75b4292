package graft.analysis

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.map { case (t, k) => (new Timestamp(t * 1000L), k) }
      .toDF("ts", "kind")

  test("hour-of-day cells pool the same clock hour across days; " +
      "z-scores match hand-computed moments") {
    // kind x, hour-0 cells across 3 days: counts 2, 2, 5
    // hour-1 cell on day 0 only: count 1 (other days zero-filled)
    val df = ev(
      (0L, "x"), (10L, "x"),                        // day 0 hour 0 → 2
      (86400L, "x"), (86410L, "x"),                 // day 1 hour 0 → 2
      (172800L, "x"), (172801L, "x"), (172802L, "x"),
      (172803L, "x"), (172804L, "x"),               // day 2 hour 0 → 5
      (3600L, "x"))                                 // day 0 hour 1 → 1
    val out = Seasonal.hourOfDayAnomalies(df, "ts", Seq("kind"))
      .orderBy("bucket").collect()
    // spine: buckets 0 .. 172800 hourly = 49 cells for the one key
    assert(out.length == 49)
    val h0 = out.filter(_.getAs[Int]("hod") == 0)
    assert(h0.map(_.getAs[Long]("cnt")).toSeq == Seq(2L, 2L, 5L))
    // hour-0 profile: n=3, s=9, ss=33 → mean=3, var=(33-27)/2=3
    val mean = 3.0
    val sd = math.sqrt(3.0)
    h0.foreach { r =>
      assert(r.getAs[Double]("mean") == mean)
      val z = r.getAs[Double]("z")
      assert(math.abs(z - (r.getAs[Long]("cnt") - mean) / sd) < 1e-12)
      assert(!r.getAs[Boolean]("anomaly"))
    }
    // hour-1 profile (the spine ends at the max OBSERVED bucket — day 2
    // hour 0 — so hour 1 has two cells): counts 1,0 → n=2, s=1, ss=1,
    // mean=1/2, var=(1-1/2)/1=1/2
    val h1 = out.filter(_.getAs[Int]("hod") == 1)
    assert(h1.map(_.getAs[Long]("cnt")).toSeq == Seq(1L, 0L))
    val m1 = 0.5
    val sd1 = math.sqrt(0.5)
    h1.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(math.abs(z - (r.getAs[Long]("cnt") - m1) / sd1) < 1e-12)
    }
    // hours 2..23 of the spine exist with zero counts and z null
    // (all-zero cells: variance 0 → no z, no anomaly verdict)
    val h2 = out.filter(_.getAs[Int]("hod") == 2)
    assert(h2.length == 2 && h2.forall(_.getAs[Long]("cnt") == 0L))
    assert(h2.forall(r => r.isNullAt(r.fieldIndex("z"))))
    assert(h2.forall(r => r.isNullAt(r.fieldIndex("anomaly"))))
  }

  test("a sustained spike in its own clock hour flags as an anomaly") {
    // 15 quiet days then one loud day in hour 0. (The profile is
    // self-inclusive, so a single outlier among n observations caps at
    // z ≈ √n − 1/√n — n = 16 cells puts the ceiling at 3.75 > 3.)
    val quiet = (0 until 15).flatMap(d => Seq((d * 86400L, "x")))
    val loud = (0 until 40).map(i => (15 * 86400L + i, "x"))
    val out = Seasonal.hourOfDayAnomalies(ev(quiet ++ loud: _*),
      "ts", Seq("kind"), zThreshold = 3.0)
    val flagged = out.filter(col("anomaly")).collect()
    assert(flagged.length == 1)
    assert(flagged.head.getAs[Long]("cnt") == 40L)
    assert(flagged.head.getAs[Int]("hod") == 0)
  }

  test("keys profile independently and validation is loud") {
    val df = ev((0L, "x"), (3600L, "y"))
    val out = Seasonal.hourOfDayAnomalies(df, "ts", Seq("kind"))
      .select("kind", "bucket", "cnt")
      .as[(String, Long, Long)].collect().toSet
    // both keys get both spine buckets, zero-filled where absent
    assert(out == Set(("x", 0L, 1L), ("x", 3600L, 0L),
      ("y", 0L, 0L), ("y", 3600L, 1L)))
    intercept[IllegalArgumentException] {
      Seasonal.hourOfDayAnomalies(df, "ts", Seq("kind"),
        stepSeconds = 7000L) // does not divide 86400
    }
    intercept[IllegalArgumentException] {
      // divides 86400 but straddles clock hours (1.5 h buckets)
      Seasonal.hourOfDayAnomalies(df, "ts", Seq("kind"),
        stepSeconds = 5400L)
    }
    intercept[IllegalArgumentException] {
      Seasonal.hourOfDayAnomalies(df, "ts", Seq.empty)
    }
    // pre-1970 buckets keep hod in [0, 23] (pmod, not signed %)
    val old = ev((-1800L, "x"), (0L, "x"))
    val hods = Seasonal.hourOfDayAnomalies(old, "ts", Seq("kind"))
      .select("hod").as[Int].collect().toSet
    assert(hods == Set(23, 0))
  }
}
