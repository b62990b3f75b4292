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

  test("checkpoint restart CONTINUES the consecutive counter: an " +
      "exceed before the stop and one after it together fire the " +
      "2-window alert") {
    // the EwmaStreamSpec recovery pattern applied to the alert state
    // machine (consecutive count + last state + last window): a lost
    // RunState would reset consecutive to 0 and never fire
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("alert_restart").toString
    val mem = MemoryStream[(String, Timestamp, Double)]
    def start() = AlertStream.transitions(
        mem.toDF().toDF("alert_id", "window_start", "value"), configs)
      .toDF().writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    val q1 = start()
    mem.addData(("lat_p99", t(0), 3.0), ("lat_p99", t(1), 7.0))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    // consecutive exceed #2 lands after the restart -> ALERT; then
    // recovery -> OK (also proves lastWindowMillis restored: a replayed
    // t(1) would otherwise re-count)
    mem.addData(("lat_p99", t(2), 8.0), ("lat_p99", t(3), 2.0))
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(s"$dir/out")
      .orderBy("window_start").select("window_start", "state", "value")
      .as[(Timestamp, String, Double)].collect().toSeq
    assert(rows == Seq((t(2), "ALERT", 8.0), (t(3), "OK", 2.0)),
      rows.toString)
  }
}
