package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TailSampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  // rows: (ts, trace, err, lat, payload)
  private def start(mem: MemoryStream[(Timestamp, String, Boolean, Double,
      String)], name: String, keepFraction: Double = 0.0) = {
    val stream = mem.toDF().toDF("ts", "trace", "err", "lat", "payload")
      .withWatermark("ts", "0 seconds")
    TailSampleStream.sample(stream, "trace", "ts", "err", "lat",
      "payload", decisionWaitSeconds = 60L, latencyThreshold = 500.0,
      keepFraction = keepFraction)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
  }

  test("buffer until the decision point, then flush kept traces whole") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Boolean, Double, String)]
    val q = start(mem, "ts_out")
    // t-err: an error span; t-slow: 900ms span; t-ok: nothing special
    mem.addData(
      (t("2024-01-01 00:00:00"), "t-err", false, 10.0, "e1"),
      (t("2024-01-01 00:00:05"), "t-err", true, 20.0, "e2"),
      (t("2024-01-01 00:00:00"), "t-slow", false, 900.0, "s1"),
      (t("2024-01-01 00:00:00"), "t-ok", false, 5.0, "o1"))
    q.processAllAvailable()
    // nothing decided yet: watermark is still before first+60s
    assert(spark.sql("SELECT * FROM ts_out").count() == 0)
    // advance the watermark past every trace's decision point
    mem.addData((t("2024-01-01 00:05:00"), "t-later", false, 1.0, "x"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT trace, payload, reason FROM ts_out ORDER BY trace, payload")
      .as[(String, String, String)].collect().toSeq
    q.stop()
    assert(rows == Seq(
      ("t-err", "e1", "error"), ("t-err", "e2", "error"),
      ("t-slow", "s1", "latency")))
  }

  test("late spans follow the decision: kept forward, dropped stay dropped") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Boolean, Double, String)]
    val q = start(mem, "ts_late")
    mem.addData(
      (t("2024-01-01 00:00:00"), "t-err", true, 10.0, "e1"),
      (t("2024-01-01 00:00:00"), "t-ok", false, 5.0, "o1"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:05:00"), "t-x", false, 1.0, "x"))
    q.processAllAvailable() // both traces decided
    // late spans arrive after the decision (their event time doesn't
    // matter — the trace state routes them)
    mem.addData(
      (t("2024-01-01 00:06:00"), "t-err", false, 1.0, "e9"),
      (t("2024-01-01 00:06:00"), "t-ok", true, 999.0, "o9"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT trace, payload, reason FROM ts_late ORDER BY trace, payload")
      .as[(String, String, String)].collect().toSeq
    q.stop()
    // t-ok's late span is dropped even though it ERRORED: the OTel
    // contract — a decision never flips
    assert(rows == Seq(("t-err", "e1", "error"), ("t-err", "e9", "error")))
  }

  test("decision fires safely when the watermark already passed retention") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Boolean, Double, String)]
    val stream = mem.toDF().toDF("ts", "trace", "err", "lat", "payload")
      .withWatermark("ts", "0 seconds")
    // retention 0: the tombstone expiry is ALWAYS behind the watermark
    // at decision time — must remove state, not crash the query
    val q = TailSampleStream.sample(stream, "trace", "ts", "err", "lat",
      "payload", decisionWaitSeconds = 60L, latencyThreshold = 500.0,
      keepFraction = 0.0, retentionSeconds = 0L)
      .writeStream.format("memory").queryName("ts_ret0")
      .outputMode("append").start()
    mem.addData((t("2024-01-01 00:00:00"), "t-err", true, 10.0, "e1"))
    q.processAllAvailable()
    // watermark leaps hours past t-err's decision point AND retention
    mem.addData((t("2024-01-01 05:00:00"), "t-x", false, 1.0, "x"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 06:00:00"), "t-y", false, 1.0, "y"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT trace, payload FROM ts_ret0")
      .as[(String, String)].collect().toSeq
    q.stop()
    assert(rows == Seq(("t-err", "e1")))
  }

  test("null err/lat rows decide like the batch operator, not crash") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, java.lang.Boolean,
      java.lang.Double, String)]
    val stream = mem.toDF().toDF("ts", "trace", "err", "lat", "payload")
      .withWatermark("ts", "0 seconds")
    val q = TailSampleStream.sample(stream, "trace", "ts", "err", "lat",
      "payload", decisionWaitSeconds = 60L, latencyThreshold = 500.0,
      keepFraction = 0.0)
      .writeStream.format("memory").queryName("ts_null")
      .outputMode("append").start()
    mem.addData(
      (t("2024-01-01 00:00:00"), "t-n", null, null, "n1"),
      (t("2024-01-01 00:00:00"), "t-e", null,
        java.lang.Double.valueOf(900.0), "e1"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 01:00:00"), "t-x",
      java.lang.Boolean.FALSE, java.lang.Double.valueOf(1.0), "x"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT trace, payload, reason FROM ts_null")
      .as[(String, String, String)].collect().toSeq
    q.stop()
    // all-null trace falls through every policy (dropped at frac 0);
    // the latency policy still sees real values next to nulls
    assert(rows == Seq(("t-e", "e1", "latency")))
  }

  test("probabilistic policy matches the batch operator's hash exactly") {
    // streaming kernel hash == batch Column hash for the same ids
    val ids = (1 to 50).map(_.toString)
    val batch = ids.toDF("id")
      .select(col("id"), graft.pipeline.Curation.hashUniform(col("id")))
      .as[(String, Double)].collect().toMap
    ids.foreach { id =>
      assert(math.abs(TailSampleStream.hashUniform(id) - batch(id)) < 1e-12,
        s"hash mismatch for $id")
    }
  }

  test("streamed decisions equal the batch sampler on finalized traces") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Boolean, Double, String)]
    val q = start(mem, "ts_parity", keepFraction = 0.3)
    val spans = (0 until 40).map { i =>
      (t(f"2024-01-01 00:00:${i % 50}%02d"), s"tr${i / 4}",
        i % 17 == 0, (i * 37 % 1000).toDouble, s"p$i")
    }
    mem.addData(spans: _*)
    q.processAllAvailable()
    mem.addData((t("2024-01-01 01:00:00"), "zz-later", false, 1.0, "x"))
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT trace, payload, reason FROM ts_parity")
      .as[(String, String, String)].collect().toSet
    q.stop()
    val batch = graft.analysis.TailSampling.sample(
      spans.toDF("ts", "trace", "err", "lat", "payload"),
      "trace", col("err"), col("lat"), latencyThreshold = 500.0,
      keepFraction = 0.3)
      .select("trace", "payload", "reason")
      .as[(String, String, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("checkpoint restart CONTINUES the trace buffer: spans buffered " +
      "in lifetime 1 flush when the decision point passes after the " +
      "restart") {
    // the EwmaStreamSpec recovery pattern applied to the per-trace
    // pending-buffer state: a lost buffer would silently drop e1/e2
    // (the decision would see an empty trace and never emit them)
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("tail_restart").toString
    val mem = MemoryStream[(Timestamp, String, Boolean, Double, String)]
    def start() = TailSampleStream.sample(
        mem.toDF().toDF("ts", "trace", "err", "lat", "payload")
          .withWatermark("ts", "0 seconds"),
        "trace", "ts", "err", "lat", "payload",
        decisionWaitSeconds = 60L, latencyThreshold = 500.0,
        keepFraction = 0.0)
      .toDF().writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    // ---- lifetime 1: buffer two spans of an erroring trace; the
    // watermark never reaches the decision point, nothing emits
    val q1 = start()
    mem.addData(
      (t("2024-01-01 00:00:00"), "t-err", false, 10.0, "e1"),
      (t("2024-01-01 00:00:05"), "t-err", true, 20.0, "e2"))
    q1.processAllAvailable()
    q1.stop()
    assert(!new java.io.File(s"$dir/out").exists() ||
      spark.read.parquet(s"$dir/out").isEmpty)

    // ---- lifetime 2: restart; a sentinel trace pushes the watermark
    // past t-err's decision point -> the RECOVERED buffer flushes whole
    val q2 = start()
    mem.addData((t("2024-01-01 00:05:00"), "t-x", false, 1.0, "x"))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:10:00"), "t-x", false, 1.0, "x2"))
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(s"$dir/out")
      .select("trace", "payload", "reason")
      .as[(String, String, String)].collect().toSeq.sorted
    assert(rows == Seq(("t-err", "e1", "error"),
      ("t-err", "e2", "error")), rows.toString)
  }
}
