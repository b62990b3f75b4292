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
