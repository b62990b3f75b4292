package graft.analysis

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.compile.{Catalog, Source}
import graft.ir._

class AlertRunnerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalog: Catalog = {
    // errors: 0 in 10:00-10:05, 3 in 10:05-10:10, 4 in 10:10-10:15
    val rows = Seq(
      ("2024-01-05 10:06:00", "error"), ("2024-01-05 10:07:00", "error"),
      ("2024-01-05 10:08:00", "error"),
      ("2024-01-05 10:11:00", "error"), ("2024-01-05 10:12:00", "error"),
      ("2024-01-05 10:13:00", "error"), ("2024-01-05 10:14:00", "error"),
      ("2024-01-05 10:12:30", "ok"))
      .map { case (t, s) => (Timestamp.valueOf(t), s) }
    new Catalog(Map("logs" -> Source(
      rows.toDF("ts", "status"),
      timestampColumn = Some("ts"),
      implicitColumns = Seq("status"))))
  }

  private val now = Instant.parse("2024-01-05T10:16:30Z")

  test("novelty alert fires on new templates, not baseline or rare ones") {
    // baseline [10:00, 10:10): "old path" lines; current [10:10, 10:20):
    // the old shape continues, one NEW shape repeats 3x, another new
    // shape appears only once (below minCount)
    val rows = Seq(
      ("2024-01-05 10:01:00", "old path took 12.5 ms"),
      ("2024-01-05 10:05:00", "old path took 13.5 ms"),
      ("2024-01-05 10:11:00", "old path took 14.5 ms"),
      ("2024-01-05 10:12:00", "panic at 0xdeadbeef in worker"),
      ("2024-01-05 10:13:00", "panic at 0xcafebabe in worker"),
      ("2024-01-05 10:14:00", "panic at 0xabad1dea in worker"),
      ("2024-01-05 10:15:00", "lonely warning 9999"))
      .map { case (t, l) => (Timestamp.valueOf(t), l) }
      .toDF("ts", "line")
    val r = AlertRunner.evaluateNovelty(rows, "ts", "line",
      Instant.parse("2024-01-05T10:20:00Z"),
      baselineSeconds = 600, currentSeconds = 600, minCount = 3)
    assert(r.map(_.group) == Seq(Seq("panic at <HEX> in worker")))
    assert(r.head.state == Alerts.ALERT)
    assert(r.head.windowValues ==
      Seq(Instant.parse("2024-01-05T10:10:00Z") -> 3.0))
    // surge opt-in: quadruple the old shape's rate in the current window
    val surged = rows.unionByName(Seq(
      ("2024-01-05 10:16:00", "old path took 1.5 ms"),
      ("2024-01-05 10:17:00", "old path took 2.5 ms"),
      ("2024-01-05 10:18:00", "old path took 3.5 ms"),
      ("2024-01-05 10:19:00", "old path took 4.5 ms"))
      .map { case (t, l) => (Timestamp.valueOf(t), l) }
      .toDF("ts", "line"))
    val r2 = AlertRunner.evaluateNovelty(surged, "ts", "line",
      Instant.parse("2024-01-05T10:20:00Z"),
      baselineSeconds = 600, currentSeconds = 600, minCount = 3,
      includeSurge = true)
    assert(r2.map(_.group.head).toSet ==
      Set("panic at <HEX> in worker", "old path took <NUM> ms"))
  }

  test("fires when the last window exceeds; respects lucene where") {
    val r = AlertRunner.evaluate(catalog, AlertRunner.AlertConfig(
      source = "logs",
      where = Some(Cond.Lucene("status:error")),
      intervalMinutes = 5, threshold = 4,
      numConsecutiveWindows = 1), now)
    assert(r.length == 1)
    assert(r.head.state == Alerts.ALERT)
    assert(r.head.windowValues.map(_._2) == Seq(4.0))
  }

  test("consecutive windows: 2 needed, only last exceeds -> OK; both -> ALERT") {
    def eval(threshold: Double) = AlertRunner.evaluate(catalog,
      AlertRunner.AlertConfig(
        source = "logs",
        where = Some(Cond.Lucene("status:error")),
        intervalMinutes = 5, threshold = threshold,
        numConsecutiveWindows = 2), now).head
    // windows 10:05(3) and 10:10(4): threshold 4 → (false,true) → OK
    assert(eval(4).state == Alerts.OK)
    // threshold 3 → (true,true) → ALERT
    assert(eval(3).state == Alerts.ALERT)
  }

  test("missing windows count as zero (Below fires on silence)") {
    val r = AlertRunner.evaluate(catalog, AlertRunner.AlertConfig(
      source = "logs",
      where = Some(Cond.Lucene("status:nosuchthing")),
      intervalMinutes = 5, threshold = 1,
      thresholdType = Alerts.ThresholdType.Below,
      numConsecutiveWindows = 3), now)
    assert(r.head.state == Alerts.ALERT)
    assert(r.head.windowValues.map(_._2) == Seq(0.0, 0.0, 0.0))
  }

  test("silencing suppresses firing but not evaluation; an elapsed " +
      "silence self-expires") {
    val cfg = AlertRunner.AlertConfig(
      source = "logs", where = None, intervalMinutes = 5, threshold = 1)
    val results = AlertRunner.evaluate(catalog, cfg, now)
    assert(results.exists(_.state == Alerts.ALERT)) // state observable
    val silenced = cfg.copy(silencedUntil = Some(now.plusSeconds(3600)))
    assert(AlertRunner.isSilenced(silenced, now))
    assert(AlertRunner.firing(results, silenced, now).isEmpty)
    // silence elapsed → fires again with no cleanup step
    val expired = cfg.copy(silencedUntil = Some(now.minusSeconds(1)))
    assert(!AlertRunner.isSilenced(expired, now))
    assert(AlertRunner.firing(results, expired, now) ==
      results.filter(_.state == Alerts.ALERT))
    // and firing never emits OK results
    assert(AlertRunner.firing(results, cfg, now)
      .forall(_.state == Alerts.ALERT))
  }

  test("grouped alerts evaluated per group") {
    val r = AlertRunner.evaluate(catalog, AlertRunner.AlertConfig(
      source = "logs",
      where = None,
      groupBy = Seq("status"),
      intervalMinutes = 5, threshold = 4,
      numConsecutiveWindows = 1), now)
    val states = r.map(x => x.group.head -> x.state).toMap
    assert(states("error") == Alerts.ALERT)
    assert(states("ok") == Alerts.OK)
  }

  test("PromQL alert source: per-label threshold over the lookback") {
    // gauge frame: api last-values 10 (10:05 window) and 99 (10:10
    // window); db stays at 5
    val frame = Seq(
      ("2024-01-05 10:06:00", "api", 10.0),
      ("2024-01-05 10:11:00", "api", 99.0),
      ("2024-01-05 10:06:30", "db", 5.0),
      ("2024-01-05 10:12:00", "db", 5.0))
      .map { case (t, s, v) => (Timestamp.valueOf(t), s, v) }
      .toDF("TimeUnix", "ServiceName", "value")
      .select(lit("mem").as("MetricName"), col("ServiceName"),
        col("TimeUnix"), col("value").as("Value"),
        map().cast("map<string,string>").as("Attributes"))
    val r = AlertRunner.evaluatePromQl(frame,
      "sum by (ServiceName) (mem)",
      AlertRunner.AlertConfig(source = "", where = None,
        intervalMinutes = 5, threshold = 50,
        numConsecutiveWindows = 1), now)
    val states = r.map(x => x.group.head -> x.state).toMap
    assert(states("api") == Alerts.ALERT)
    assert(states("db") == Alerts.OK)
  }

  test("PromQL alert with a sliding range derives its own lookback") {
    // samples across 10:00-10:15; alert window [10:10, 10:15) at 10:16.
    // The window-start bucket 10:10 holds the sliding evaluation over
    // (10:15 − range, 10:15] — the scan padding for the range comes from
    // PromQl.maxLookback, no caller flag
    val frame = Seq(
      ("2024-01-05 10:06:00", "api", 99.0),
      ("2024-01-05 10:12:00", "api", 10.0))
      .map { case (t, s, v) => (Timestamp.valueOf(t), s, v) }
      .toDF("TimeUnix", "ServiceName", "value")
      .select(lit("mem").as("MetricName"), col("ServiceName"),
        col("TimeUnix"), col("value").as("Value"),
        map().cast("map<string,string>").as("Attributes"))
    def eval(promql: String) = AlertRunner.evaluatePromQl(frame, promql,
      AlertRunner.AlertConfig(source = "", where = None,
        intervalMinutes = 5, threshold = 50,
        numConsecutiveWindows = 1), now).head
    // 10m window (10:05,10:15] reaches the 99 at 10:06 → ALERT, and the
    // scan was auto-padded to include it
    assert(eval("max_over_time(mem[10m])").state == Alerts.ALERT)
    // 4m window (10:11,10:15] sees only the 10 at 10:12 → OK
    assert(eval("max_over_time(mem[4m])").state == Alerts.OK)
  }

  test("burn-rate alert: fires only when both windows breach at the last closed step") {
    import org.apache.spark.sql.functions.col
    // 1-min step, 2m short / 10m long, budget 0.1, threshold 2 ⇒ fire
    // needs error ratio > 0.2 in BOTH trailing windows at 10:15.
    // Sustained errors 10:08-10:14 breach both; with a clean last two
    // minutes the short window de-asserts even though the long recalls.
    def ev(rows: Seq[(String, String)]) = rows
      .map { case (t, s) => (Timestamp.valueOf(t), s) }
      .toDF("ts", "status")
    def run(rows: Seq[(String, String)]) = AlertRunner.evaluateBurnRate(
      ev(rows), "ts", col("status") === "error",
      AlertRunner.AlertConfig(source = "", where = None,
        intervalMinutes = 1, threshold = 2.0),
      now, shortWindowSeconds = 120L, longWindowSeconds = 600L,
      errorBudget = 0.1).head
    val burning = (8 to 15).map(m =>
      (f"2024-01-05 10:$m%02d:10", "error")) :+
      (("2024-01-05 10:06:20", "ok"))
    assert(run(burning).state == Alerts.ALERT)
    // same burn history but the last two minutes are clean traffic:
    // the short window clears, the alert must NOT fire
    val recovered = (8 to 13).map(m =>
      (f"2024-01-05 10:$m%02d:10", "error")) ++ Seq(
      ("2024-01-05 10:14:10", "ok"), ("2024-01-05 10:14:40", "ok"),
      ("2024-01-05 10:15:10", "ok"))
    val r = run(recovered)
    assert(r.state == Alerts.OK)
    // windowValues: recent closed steps' short-window burn, most
    // recent last — the de-asserted step reports burn 0
    assert(r.windowValues.last._2 == 0.0)
    // no traffic at all: never fires
    assert(run(Seq(("2024-01-05 09:00:00", "ok"))).state == Alerts.OK)
    // unsupported config knobs are rejected loudly, never ignored
    intercept[IllegalArgumentException] {
      AlertRunner.evaluateBurnRate(ev(burning), "ts",
        col("status") === "error",
        AlertRunner.AlertConfig(source = "", where = None,
          groupBy = Seq("status"), intervalMinutes = 1, threshold = 2.0),
        now, 120L, 600L, 0.1)
    }
  }
}
