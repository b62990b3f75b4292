package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SloStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(epoch: Long) = new Timestamp(epoch * 1000L)

  // step 60, windows 120/300, budget 0.1, threshold 2
  private def start(mem: MemoryStream[(Timestamp, String)], name: String) = {
    val out = SloStream.multiWindowAlert(
      mem.toDF().toDF("ts", "kind"), "ts", col("kind") === "error",
      stepSeconds = 60L, shortWindow = 120L, longWindow = 300L,
      errorBudget = 0.1, threshold = 2.0)
    out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
  }

  test("finalized cells equal the batch twin on the same events") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = start(mem, "slo_out")
    // a burst: clean minute 0, errors minute 1-2, clean minute 3
    val events = Seq(0L -> false, 10L -> false, 70L -> true, 80L -> true,
      130L -> true, 200L -> false)
    mem.addData(events.map { case (t, b) =>
      (ts(t), if (b) "error" else "ok") }: _*)
    q.processAllAvailable()
    // watermark driver: delay = 0 + 300 - 60 = 240s on step_ts; this
    // event's own earliest cell is at 3600 -> frontier 3600+240-240 ...
    // far enough to finalize every cell of the burst
    mem.addData((ts(3600L), "ok"))
    q.processAllAvailable()
    mem.addData((ts(7200L), "ok"))
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT bucket, total_120s, err_120s, total_300s, err_300s, firing " +
        "FROM slo_out ORDER BY bucket")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    q.stop()

    val batch = graft.analysis.Slo.multiWindowAlert(
      (events.map { case (t, b) => (ts(t), if (b) "error" else "ok") } :+
        ((ts(3600L), "ok")) :+ ((ts(7200L), "ok")))
        .toDF("ts", "kind"),
      "ts", col("kind") === "error", 60L, 120L, 300L, 0.1, 2.0)
      .select("bucket", "total_120s", "err_120s", "total_300s",
        "err_300s", "firing")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    assert(streamed.nonEmpty)
    // every streamed (finalized) cell matches the batch computation
    streamed.foreach { r =>
      assert(batch(r._1) == r, s"bucket ${r._1}: got $r want ${batch(r._1)}")
    }
    // the burst's cells all finalized: minute-1/2 errors push both
    // windows over threshold by bucket 120
    val byBucket = streamed.map(r => r._1 -> r).toMap
    assert(byBucket.contains(120L) && byBucket(120L)._6 == 1L,
      s"expected firing at 120: $streamed")
    assert(byBucket(0L)._6 == 0L)
    // streaming emits exactly the batch cells that saw contributions
    val batchActive = batch.values.filter(r => r._4 > 0).map(_._1).toSet
    val finalized = batchActive.filter(_ < 7200L - 240L)
    assert(finalized.subsetOf(streamed.map(_._1).toSet),
      s"missing finalized cells: ${finalized -- streamed.map(_._1).toSet}")
  }

  test("state stays bounded: late event beyond lateness loses only old cells") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = start(mem, "slo_late")
    mem.addData((ts(0L), "ok"), (ts(600L), "ok"))
    q.processAllAvailable()
    // watermark (on step_ts) is now 600+240-240 = 600: cells before 600
    // finalized. An error at 430 (bucket 420) is late: its long-window
    // cells span 420..660 — the already-finalized ones drop, the
    // still-open cell 660 (strictly above the watermark) still counts
    mem.addData((ts(430L), "error"))
    q.processAllAvailable()
    mem.addData((ts(3600L), "ok"))
    q.processAllAvailable()
    mem.addData((ts(7200L), "ok"))
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT bucket, err_300s FROM slo_late ORDER BY bucket")
      .as[(Long, Long)].collect().toMap
    q.stop()
    // cell 660: late error's bucket 420 is within (360, 660] -> counted
    assert(streamed(660L) == 1L, s"got $streamed")
    // cell 540 finalized before the straggler arrived -> missed it
    assert(!streamed.contains(540L) || streamed(540L) == 0L)
  }

  test("checkpoint restart CONTINUES the windowed aggregation: cells " +
      "opened before the stop accumulate lifetime-2 contributions") {
    // the EwmaStreamSpec recovery pattern applied to the tumbling-agg
    // state shape: fault-tolerant sink, same source, identical graph,
    // same checkpointLocation
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("slo_restart").toString
    val mem = MemoryStream[(Timestamp, String)]
    def start() = SloStream.multiWindowAlert(
        mem.toDF().toDF("ts", "kind"), "ts", col("kind") === "error",
        stepSeconds = 60L, shortWindow = 120L, longWindow = 300L,
        errorBudget = 0.1, threshold = 2.0)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    // ---- lifetime 1: two events open cells, nothing finalizes
    val q1 = start()
    mem.addData((ts(0L), "ok"), (ts(10L), "error"))
    q1.processAllAvailable()
    q1.stop()

    // ---- lifetime 2: one more event lands in cells the lifetime-1
    // events also feed (bucket 60's 120s family spans both), then
    // sentinels finalize everything
    val q2 = start()
    mem.addData((ts(70L), "error"))
    q2.processAllAvailable()
    mem.addData((ts(3600L), "ok"))
    q2.processAllAvailable()
    mem.addData((ts(7200L), "ok"))
    q2.processAllAvailable()
    q2.stop()
    val streamed = spark.read.parquet(s"$dir/out")
      .select("bucket", "total_120s", "err_120s", "total_300s",
        "err_300s", "firing")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    // a lost agg state would answer total_120s = 1 at bucket 60 (the
    // lifetime-2 event alone); recovery answers all three events
    val at60 = streamed.find(_._1 == 60L)
    assert(at60.exists(_._2 == 3L), s"bucket 60: $streamed")
    // and every finalized cell equals the batch twin over the union
    val batch = graft.analysis.Slo.multiWindowAlert(
      Seq((ts(0L), "ok"), (ts(10L), "error"), (ts(70L), "error"),
        (ts(3600L), "ok"), (ts(7200L), "ok")).toDF("ts", "kind"),
      "ts", col("kind") === "error", 60L, 120L, 300L, 0.1, 2.0)
      .select("bucket", "total_120s", "err_120s", "total_300s",
        "err_300s", "firing")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    streamed.foreach(r => assert(batch(r._1) == r,
      s"bucket ${r._1}: got $r want ${batch(r._1)}"))
  }
}
