package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.analysis.Alerts

class AlertStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private val configs = Map(
    "lat_p99" -> AlertStream.AlertSpec(
      Alerts.ThresholdType.Above, threshold = 5.0, numConsecutive = 2),
    "errors" -> AlertStream.AlertSpec(
      Alerts.ThresholdType.AboveExclusive, threshold = 0.0))

  test("state machine fires only on transitions, across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val stream = mem.toDF().toDF("alert_id", "window_start", "value")
    val q = AlertStream.transitions(stream, configs)
      .writeStream.format("memory").queryName("alert_out")
      .outputMode("append").start()
    // batch 1: below, one exceed (consec 1 of 2) → no transition yet
    mem.addData(("lat_p99", t(0), 3.0), ("lat_p99", t(1), 7.0))
    q.processAllAvailable()
    assert(spark.table("alert_out").count() == 0)
    // batch 2: second consecutive exceed → ALERT; then recovery → OK.
    // State must have survived the micro-batch boundary.
    mem.addData(("lat_p99", t(2), 8.0), ("lat_p99", t(3), 2.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT window_start, state, value FROM alert_out ORDER BY window_start")
      .as[(Timestamp, String, Double)].collect().toSeq
    q.stop()
    assert(rows == Seq((t(2), "ALERT", 8.0), (t(3), "OK", 2.0)))
  }

  test("unknown alert ids are ignored; single-window alerts fire at once") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val stream = mem.toDF().toDF("alert_id", "window_start", "value")
    val q = AlertStream.transitions(stream, configs)
      .writeStream.format("memory").queryName("alert_out2")
      .outputMode("append").start()
    mem.addData(("errors", t(0), 1.0), ("nope", t(0), 99.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT alert_id, state FROM alert_out2")
      .as[(String, String)].collect().toSeq
    q.stop()
    assert(rows == Seq(("errors", "ALERT")))
  }

  test("late windows from earlier batches are dropped, not re-applied") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val stream = mem.toDF().toDF("alert_id", "window_start", "value")
    val q = AlertStream.transitions(stream, configs)
      .writeStream.format("memory").queryName("alert_out3")
      .outputMode("append").start()
    // batch 1: one exceed at minute 2 (consec 1 of 2)
    mem.addData(("lat_p99", t(2), 9.0))
    q.processAllAvailable()
    // batch 2: a LATE below-threshold window at minute 1 — if applied it
    // would reset the counter; it must be dropped, so the exceed at
    // minute 3 is the 2nd consecutive → ALERT
    mem.addData(("lat_p99", t(1), 1.0), ("lat_p99", t(3), 8.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT window_start, state FROM alert_out3 ORDER BY window_start")
      .as[(Timestamp, String)].collect().toSeq
    q.stop()
    assert(rows == Seq((t(3), "ALERT")))
  }
}
