package graft.analysis

import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DrainSpec extends AnyFunSuite {

  test("clusters parameterize variable tokens") {
    val d = new Drain()
    d.addLogMessage("connected to 10.0.0.1 port 8080")
    d.addLogMessage("connected to 10.0.0.2 port 9090")
    val (c, _) = d.addLogMessage("connected to 10.0.0.3 port 1234")
    assert(d.clusterCount == 1)
    assert(c.template == "connected to <*> port <*>")
    assert(c.size == 3)
  }

  test("dissimilar lines become separate clusters") {
    val d = new Drain()
    d.addLogMessage("user login failed for admin")
    d.addLogMessage("cache miss on key session")
    assert(d.clusterCount == 2)
  }

  test("token-count partitioning keeps different shapes apart") {
    val d = new Drain()
    d.addLogMessage("error occurred")
    d.addLogMessage("error occurred in module alpha during startup")
    assert(d.clusterCount == 2)
  }

  test("numeric tokens route to wildcard tree branch") {
    val d = new Drain()
    d.addLogMessage("request 123 took 45 ms total")
    d.addLogMessage("request 456 took 78 ms total")
    assert(d.clusterCount == 1)
    assert(d.allClusters.head.template == "request <*> took <*> ms total")
  }

  test("LRU cap evicts oldest clusters") {
    val d = new Drain(maxClusters = Some(2))
    d.addLogMessage("alpha one two")
    d.addLogMessage("beta three four five")
    d.addLogMessage("gamma six seven eight nine")
    assert(d.clusterCount == 2)
  }

  test("masking normalizes ips, uuids, hex, large numbers") {
    assert(Masking.mask("ip 10.1.2.3:443 id 0xdeadbeef n 12345") ==
      "ip <IP> id <HEX> n <NUM>")
  }

  test("matchLogMessage does not mutate state") {
    val d = new Drain()
    d.addLogMessage("job started on node a1")
    val before = d.clusterCount
    assert(d.matchLogMessage("job started on node b2").isDefined)
    assert(d.clusterCount == before)
  }
}

class PatternsSpec extends SparkSpec {

  test("mining over events props yields estimated counts") {
    val df = spark.range(0, 1000).select(
      col("id"),
      concat(lit("processed request "), col("id"),
        lit(" in "), col("id") % 97, lit(" ms")).as("body"))
    val out = Patterns.minePatterns(spark, df, "body", "id",
      sampleSize = 500)
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("template") ==
      "processed request <*> in <*> ms")
    assert(r.getAs[Long]("sampleCount") == 500)
    assert(r.getAs[Long]("estimatedCount") == 1000)
  }

  test("trend buckets concentrate where the pattern's rows are") {
    // pattern A fires in the first hour, pattern B in the last hour of a
    // 4-hour span → trend mass lands in opposite quarters
    val df = spark.range(0, 400).select(
      col("id"),
      when(col("id") < 200,
        concat(lit("login ok user "), col("id")))
        .otherwise(concat(lit("payment failed order "), col("id")))
        .as("body"),
      when(col("id") < 200,
        timestamp_seconds(lit(1704067200L) + col("id")))
        .otherwise(
          timestamp_seconds(lit(1704067200L + 3 * 3600) + col("id") - 200))
        .as("ts"))
    val out = Patterns.minePatternsWithTrend(spark, df, "body", "id", "ts",
      sampleSize = 400, buckets = 4)
    val byTpl = out.collect()
      .map(r => r.getAs[String]("template") -> r.getSeq[Long](4)).toMap
    val login = byTpl("login ok user <*>")
    val pay = byTpl("payment failed order <*>")
    assert(login.head > 0 && login.last == 0)
    assert(pay.head == 0 && pay.last > 0)
    assert(login.sum == 200 && pay.sum == 200)
  }

  test("maskTemplate matches the driver-side Masking chain") {
    import spark.implicits._
    val lines = Seq(
      "ip 10.1.2.3:443 id 0xdeadbeef n 12345",
      "uuid 123e4567-e89b-42d3-a456-426614174000 took 3.75 ms",
      "small 42 stays but 9999 goes")
    val got = lines.toDF("l")
      .select(Patterns.maskTemplate(col("l"))).as[String].collect()
    assert(got.toSeq == lines.map(Masking.mask))
  }

  test("templateDiff classifies new / gone / surge / drop / steady") {
    import spark.implicits._
    // base window [0, 100)s, current [100, 300)s — 1:2 lengths, so equal
    // counts mean the rate HALVES (ratio 0.5 → drop boundary, inclusive)
    def at(s: Long) = java.sql.Timestamp.from(
      Instant.parse("2024-01-01T00:00:00Z").plusSeconds(s))
    val rows =
      // steady: 10 base, 20 cur → ratio 1.0
      (0L until 10L).map(i => (at(i), s"steady req ${9000 + i} ok")) ++
      (0L until 20L).map(i => (at(100 + i), s"steady req ${9000 + i} ok")) ++
      // surge: 2 base, 20 cur → ratio 5.0
      (0L until 2L).map(i => (at(i), "surge cache miss")) ++
      (0L until 20L).map(i => (at(100 + i), "surge cache miss")) ++
      // drop (boundary): 4 base, 4 cur → ratio 0.5 exactly
      (0L until 4L).map(i => (at(i), "drop old path")) ++
      (0L until 4L).map(i => (at(100 + i), "drop old path")) ++
      // new / gone
      Seq((at(150), "new panic at 0xabcdef99"), (at(5), "gone legacy call")) ++
      // outside the range entirely: ignored
      Seq((at(500), "steady req 9001 ok"))
    val out = Patterns.templateDiff(rows.toDF("ts", "line"), "line", "ts",
      "2024-01-01T00:00:00Z", "2024-01-01T00:01:40Z",
      "2024-01-01T00:05:00Z", surgeRatio = 2.0)
      .collect().map(r => r.getAs[String]("template") ->
        (r.getAs[Long]("base_n"), r.getAs[Long]("cur_n"),
          r.getAs[String]("status"))).toMap
    assert(out("steady req <NUM> ok") == ((10L, 20L, "steady")))
    assert(out("surge cache miss") == ((2L, 20L, "surge")))
    assert(out("drop old path") == ((4L, 4L, "drop")))
    assert(out("new panic at <HEX>") == ((0L, 1L, "new")))
    assert(out("gone legacy call") == ((1L, 0L, "gone")))
    // rates normalize by each window's own length
    val steady = Patterns.templateDiff(rows.toDF("ts", "line"), "line",
      "ts", "2024-01-01T00:00:00Z", "2024-01-01T00:01:40Z",
      "2024-01-01T00:05:00Z")
      .filter(col("template") === "steady req <NUM> ok").head()
    assert(steady.getAs[Double]("base_rate") == 0.1)
    assert(steady.getAs[Double]("cur_rate") == 0.1)
    assert(steady.getAs[Double]("ratio") == 1.0)
  }

  test("templateDiff validates its window ordering, loudly") {
    import spark.implicits._
    val df = Seq((java.sql.Timestamp.from(Instant.EPOCH), "x")).toDF("ts", "line")
    val e = intercept[IllegalArgumentException] {
      Patterns.templateDiff(df, "line", "ts", "2024-01-02T00:00:00Z",
        "2024-01-01T00:00:00Z", "2024-01-03T00:00:00Z")
    }
    assert(e.getMessage.contains("from < split < to"))
  }
}

class EventDeltasSpec extends SparkSpec {
  import spark.implicits._

  test("attributes over-represented among outliers rank first") {
    // outliers (slow) dominated by host=h-bad
    val rows =
      (1 to 80).map(i => (i.toLong, "h-good", "GET", 10.0)) ++
        (81 to 100).map(i => (i.toLong, "h-bad", "GET", 500.0)) ++
        (101 to 105).map(i => (i.toLong, "h-bad", "POST", 12.0))
    val df = rows.toDF("row_id", "host", "method", "latency")
    val out = EventDeltas.explain(df, col("latency") > 100,
      Seq("host", "method"))
    val top = out.head()
    assert(top.getAs[String]("key") == "host")
    assert(top.getAs[String]("value") == "h-bad")
    assert(top.getAs[Double]("score") > 0.5)
  }

  test("id-like keys are denylisted") {
    val df = (1 to 50).map(i =>
      (i.toLong, s"u$i", if (i > 40) "err" else "ok"))
      .toDF("req_id", "user_id", "status")
    val out = EventDeltas.explain(df, col("status") === "err",
      Seq("req_id", "user_id", "status")).collect()
    assert(out.forall(r => r.getAs[String]("key") == "status"))
  }
}

class AlertsSpec extends AnyFunSuite {
  import Alerts._
  import Alerts.ThresholdType._

  test("all eight threshold types") {
    assert(doesExceedThreshold(Above, 10, None, 10))
    assert(!doesExceedThreshold(AboveExclusive, 10, None, 10))
    assert(doesExceedThreshold(Below, 10, None, 9.9))
    assert(doesExceedThreshold(BelowOrEqual, 10, None, 10))
    assert(doesExceedThreshold(Equal, 10, None, 10))
    assert(doesExceedThreshold(NotEqual, 10, None, 11))
    assert(doesExceedThreshold(Between, 5, Some(10), 7))
    assert(!doesExceedThreshold(Between, 5, Some(10), 11))
    assert(doesExceedThreshold(NotBetween, 5, Some(10), 11))
    intercept[IllegalArgumentException] {
      doesExceedThreshold(Between, 5, None, 7)
    }
  }

  test("threshold matrix — the reference's doesExceedThreshold battery " +
      "(checkAlerts.int.test.ts:72-971): boundary, zero, negative, " +
      "decimal per type") {
    // (type, threshold, max, value, expected)
    val cases: Seq[(ThresholdType, Double, Option[Double], Double,
        Boolean)] = Seq(
      // ABOVE = value >= t (inclusive)
      (Above, 10, None, 11, true), (Above, 10, None, 10, true),
      (Above, 10, None, 9, false),
      (Above, 0, None, 0, true), (Above, 0, None, 1, true),
      (Above, 0, None, -1, false),
      (Above, -10, None, -5, true), (Above, -10, None, -10, true),
      (Above, -10, None, -11, false),
      (Above, 1.5, None, 1.5, true), (Above, 1.5, None, 1.6, true),
      (Above, 1.5, None, 1.4, false),
      // BELOW = value < t (exclusive)
      (Below, 10, None, 9, true), (Below, 10, None, 10, false),
      (Below, 10, None, 11, false),
      (Below, 0, None, -1, true), (Below, 0, None, 0, false),
      (Below, -10, None, -11, true), (Below, -10, None, -10, false),
      (Below, 1.5, None, 1.4, true), (Below, 1.5, None, 1.5, false),
      // ABOVE_EXCLUSIVE = value > t
      (AboveExclusive, 10, None, 11, true),
      (AboveExclusive, 10, None, 10, false),
      (AboveExclusive, 10, None, 9, false),
      (AboveExclusive, 0, None, 1, true),
      (AboveExclusive, 0, None, 0, false),
      (AboveExclusive, -10, None, -9, true),
      (AboveExclusive, -10, None, -10, false),
      (AboveExclusive, 1.5, None, 1.6, true),
      (AboveExclusive, 1.5, None, 1.5, false),
      // BELOW_OR_EQUAL = value <= t
      (BelowOrEqual, 10, None, 9, true),
      (BelowOrEqual, 10, None, 10, true),
      (BelowOrEqual, 10, None, 11, false),
      (BelowOrEqual, 0, None, 0, true), (BelowOrEqual, 0, None, 1, false),
      (BelowOrEqual, -10, None, -10, true),
      (BelowOrEqual, -10, None, -9, false),
      (BelowOrEqual, 1.5, None, 1.5, true),
      (BelowOrEqual, 1.5, None, 1.6, false),
      // EQUAL / NOT_EQUAL
      (Equal, 10, None, 10, true), (Equal, 10, None, 11, false),
      (Equal, 10, None, 9, false), (Equal, 0, None, 0, true),
      (Equal, -10, None, -10, true), (Equal, 1.5, None, 1.5, true),
      (NotEqual, 10, None, 11, true), (NotEqual, 10, None, 10, false),
      (NotEqual, 0, None, 0, false), (NotEqual, -10, None, -9, true),
      (NotEqual, 1.5, None, 1.4, true),
      // BETWEEN = [t, max] inclusive both bounds
      (Between, 5, Some(10), 7, true), (Between, 5, Some(10), 5, true),
      (Between, 5, Some(10), 10, true), (Between, 5, Some(10), 4, false),
      (Between, 5, Some(10), 11, false),
      (Between, 0, Some(0), 0, true),
      (Between, -10, Some(-5), -7, true),
      (Between, -10, Some(-5), -10, true),
      (Between, -10, Some(-5), -5, true),
      (Between, -10, Some(-5), -11, false),
      (Between, -10, Some(-5), -4, false),
      (Between, 1.5, Some(2.5), 2.0, true),
      (Between, 1.5, Some(2.5), 1.5, true),
      (Between, 1.5, Some(2.5), 2.5, true),
      (Between, 1.5, Some(2.5), 1.4, false),
      (Between, 1.5, Some(2.5), 2.6, false),
      (Between, 3, Some(3), 3, true), // t == max == value
      // NOT_BETWEEN = value < t OR value > max; bounds inclusive-in
      (NotBetween, 5, Some(10), 4, true),
      (NotBetween, 5, Some(10), 11, true),
      (NotBetween, 5, Some(10), 7, false),
      (NotBetween, 5, Some(10), 5, false),
      (NotBetween, 5, Some(10), 10, false),
      (NotBetween, 0, Some(0), 0, false),
      (NotBetween, -10, Some(-5), -11, true),
      (NotBetween, -10, Some(-5), -4, true),
      (NotBetween, -10, Some(-5), -7, false),
      (NotBetween, 1.5, Some(2.5), 1.4, true),
      (NotBetween, 1.5, Some(2.5), 2.6, true),
      (NotBetween, 1.5, Some(2.5), 2.0, false))
    cases.foreach { case (tpe, t, max, v, want) =>
      assert(doesExceedThreshold(tpe, t, max, v) == want,
        s"$tpe t=$t max=$max v=$v expected $want")
    }
    // missing thresholdMax throws for both range types
    intercept[IllegalArgumentException] {
      doesExceedThreshold(Between, 5, None, 7)
    }
    intercept[IllegalArgumentException] {
      doesExceedThreshold(NotBetween, 5, None, 7)
    }
  }

  test("window anchoring: scheduleStartAt wins over offset; previous " +
      "offset window held until the next boundary (reference " +
      "getScheduledWindowStart battery)") {
    val now = Instant.parse("2024-01-05T10:17:30Z")
    // scheduleStartAt beats a conflicting offset
    val anchor = Instant.parse("2024-01-05T09:03:00Z")
    assert(getScheduledWindowStart(now, 30, 7, Some(anchor)) ==
      Instant.parse("2024-01-05T10:03:00Z"))
    // before the first anchored boundary: clamp to the anchor itself
    val early = Instant.parse("2024-01-05T09:10:00Z")
    assert(getScheduledWindowStart(early, 30, 0, Some(anchor)) == anchor)
    // offset window holds until the NEXT offset boundary: at 10:04 with
    // offset 5 the current window still starts at 09:50
    val preBoundary = Instant.parse("2024-01-05T10:04:00Z")
    assert(getScheduledWindowStart(preBoundary, 15, 5) ==
      Instant.parse("2024-01-05T09:50:00Z"))
    assert(getScheduledWindowStart(
      Instant.parse("2024-01-05T10:05:00Z"), 15, 5) ==
      Instant.parse("2024-01-05T10:05:00Z"))
  }

  test("window start math: plain, offset, anchored") {
    val now = Instant.parse("2024-01-05T10:17:30Z")
    assert(getScheduledWindowStart(now, 15) ==
      Instant.parse("2024-01-05T10:15:00Z"))
    // offset 5: boundaries at :05, :20, :35, :50
    assert(getScheduledWindowStart(now, 15, 5) ==
      Instant.parse("2024-01-05T10:05:00Z"))
    // anchored: whole windows since start
    val anchor = Instant.parse("2024-01-05T09:03:00Z")
    assert(getScheduledWindowStart(now, 30, 0, Some(anchor)) ==
      Instant.parse("2024-01-05T10:03:00Z"))
  }

  test("offset normalization") {
    assert(normalizeScheduleOffsetMinutes(None, 15) == 0)
    assert(normalizeScheduleOffsetMinutes(Some(7), 15) == 7)
    assert(normalizeScheduleOffsetMinutes(Some(22), 15) == 7)
    assert(normalizeScheduleOffsetMinutes(Some(-3), 15) == 0)
  }

  test("consecutive-window state machine; missing windows read 0") {
    val w = (0 until 3).map(i =>
      Instant.parse("2024-01-05T10:00:00Z").plusSeconds(i * 60L))
    val series = Map(w(1) -> 5.0, w(2) -> 6.0) // w(0) missing → 0
    assert(evaluate(series, w, Above, 5, None, 2) == ALERT)
    assert(evaluate(series, w, Above, 5, None, 3) == OK)
    assert(evaluate(series, w, Below, 1, None, 1) == OK)
  }
}
