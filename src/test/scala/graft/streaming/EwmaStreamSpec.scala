package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming EWMA folds watermark-finalized buckets in event " +
      "order (out-of-order arrivals included) and matches the batch " +
      "twin row for row") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "k", "x")
    val out = EwmaStream.chart(stream, "ts", "k", "x",
      stepSeconds = 60, lambda = 0.5, width = 3.0,
      target = 10.0, sigma = 2.0)
    val q = out.writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    // buckets 0 and 120 arrive BEFORE bucket 60 — the fold must still
    // walk 0, 60, 120 in event order; bucket 0 gets two values (sum)
    mem.addData(
      (t("2024-01-01 00:00:10"), "s", 4.0),
      (t("2024-01-01 00:00:50"), "s", 6.0),
      (t("2024-01-01 00:02:05"), "s", 40.0),
      (t("2024-01-01 00:01:30"), "s", 14.0))
    q.processAllAvailable()
    // sentinels push the watermark forward so earlier buckets finalize
    mem.addData((t("2024-01-01 00:10:00"), "s", 10.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:20:00"), "s", 10.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT bucket, x, z, ucl, lcl, alarm FROM ewma_out " +
        "ORDER BY bucket")
      .as[(Timestamp, Double, Double, Double, Double, Long)]
      .collect().toSeq
    q.stop()
    // the first three buckets finalized (the 00:10 sentinel is still
    // within lateness of the moving watermark at stop time or later)
    assert(rows.length >= 3, rows.toString)
    val first3 = rows.take(3)
    assert(first3.map(_._2) == Seq(10.0, 14.0, 40.0)) // bucket sums
    // z walk at λ=.5 from seed 10: 10, 12, 26
    assert(first3.map(_._3) == Seq(10.0, 12.0, 26.0))
    // the last bucket's z escapes the band → alarm
    assert(first3.last._6 == 1L)
    assert(first3.head._6 == 0L)
    // row-for-row parity with the batch twin over the same buckets
    val batchIn = Seq(("s", 0L, 10.0), ("s", 60L, 14.0),
      ("s", 120L, 40.0)).toDF("k", "b", "x")
    val batch = graft.analysis.ChangePoint.ewmaChart(batchIn, Seq("k"),
        "b", "x", lambda = 0.5, width = 3.0, target = Some(10.0),
        sigma = Some(2.0))
      .orderBy("b")
      .select("x", "z", "ucl", "lcl", "alarm")
      .as[(Double, Double, Double, Double, Long)].collect().toSeq
    val streamed = first3.map(r => (r._2, r._3, r._4, r._5, r._6))
    assert(streamed == batch, s"$streamed vs $batch")
  }

  test("checkpoint restart CONTINUES the fold: state (z, t) and the " +
      "watermark survive a stop/start cycle — the recovery property " +
      "a production deployment relies on") {
    // The restart-recovery pattern for every flatMapGroupsWithState
    // operator here (EwmaStream, FunnelStream, DriftStream, …):
    //   1. same Memory/Kafka source instance (offsets replay from it),
    //   2. a FAULT-TOLERANT sink (file/foreachBatch — the memory sink
    //      REFUSES append-mode recovery by design),
    //   3. rebuild the identical operator graph over the same source,
    //   4. start() with the SAME checkpointLocation.
    // The watermark, source offsets, and per-key state all restore
    // from the checkpoint; the fold continues where it stopped.
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("ewma_restart").toString
    val ckpt = s"$dir/ckpt"
    val outDir = s"$dir/out"
    val mem = MemoryStream[(Timestamp, String, Double)]
    def graph() = EwmaStream.chart(mem.toDF().toDF("ts", "k", "x"),
      "ts", "k", "x", stepSeconds = 60, lambda = 0.5, width = 3.0,
      target = 10.0, sigma = 2.0)
    def start() = graph().writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // ---- lifetime 1: two buckets finalize, then STOP
    val q1 = start()
    mem.addData((t("2024-01-01 00:00:10"), "s", 4.0),
      (t("2024-01-01 00:01:30"), "s", 14.0))
    q1.processAllAvailable()
    // watermark sentinels ride a DIFFERENT key so they can't pollute
    // series "s"; each batch's watermark uses the previous batch's max
    mem.addData((t("2024-01-01 00:05:00"), "wm", 0.0))
    q1.processAllAvailable()
    mem.addData((t("2024-01-01 00:06:00"), "wm", 0.0))
    q1.processAllAvailable()
    q1.stop()
    val phase1 = spark.read.parquet(outDir)
      .filter($"key" === "s").orderBy("bucket")
      .select("x", "z").as[(Double, Double)].collect().toSeq
    // z walk at λ=.5 from seed 10: bucket 0 → 7, bucket 60 → 10.5
    assert(phase1 == Seq((4.0, 7.0), (14.0, 10.5)), phase1.toString)

    // ---- lifetime 2: restart from the SAME checkpoint, feed one more
    val q2 = start()
    mem.addData((t("2024-01-01 00:06:30"), "s", 40.0))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:30:00"), "wm", 0.0))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:40:00"), "wm", 0.0))
    q2.processAllAvailable()
    q2.stop()
    val after = spark.read.parquet(outDir)
      .filter($"key" === "s").orderBy("bucket")
      .select("x", "z", "ucl").as[(Double, Double, Double)]
      .collect().toSeq
    assert(after.length == 3, after.toString)
    // CONTINUED fold: z = .5·40 + .5·10.5 = 25.25 with t = 3.
    // A restarted (lost-state) fold would answer z = 25 (seed 10) with
    // the t = 1 warm-up band — both asserted distinct here.
    assert(after.last._2 == 25.25, after.toString)
    val hwT3 = 3.0 * 2.0 * math.sqrt(0.5 / 1.5 *
      (1.0 - math.pow(0.5, 6)))
    assert(math.abs(after.last._3 - (10.0 + hwT3)) < 1e-12,
      s"ucl ${after.last._3} != t=3 band ${10.0 + hwT3}")
    // no duplicates or re-emits of lifetime-1 buckets
    assert(after.map(_._1) == Seq(4.0, 14.0, 40.0))
  }
}
