package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)
  private val steps = Seq("view", "click", "buy")

  test("levels deepen across micro-batches, exact vs batch Funnel") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val stream = mem.toDF().toDF("ts", "uid", "ev")
      .withWatermark("ts", "0 seconds")
    val ups = FunnelStream.levelUpdates(stream, "uid", "ts", "ev",
      steps, windowSeconds = 3600.0)
    val q = ups.writeStream.format("memory").queryName("fn_out")
      .outputMode("append").start()

    // batch 1: u1 view+click (chain), u2 click only (no entry step)
    mem.addData(
      (t("2024-01-01 00:00:00"), "u1", "view"),
      (t("2024-01-01 00:05:00"), "u1", "click"),
      (t("2024-01-01 00:05:00"), "u2", "click"))
    q.processAllAvailable()
    // batch 2: watermark has passed batch 1 -> u1 folds to level 2;
    // u1's buy arrives (in window), u2 gets its view
    mem.addData(
      (t("2024-01-01 00:30:00"), "u1", "buy"),
      (t("2024-01-01 00:30:00"), "u2", "view"))
    q.processAllAvailable()
    // batch 3: advance the watermark so batch 2 finalizes
    mem.addData((t("2024-01-01 02:00:00"), "u3", "view"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 03:00:00"), "u3", "scroll"))
    q.processAllAvailable()
    // a fresh (still-pending) u3 event invokes the key deterministically
    // — memory-sink tests can race the watermark-timeout-only batch
    mem.addData((t("2024-01-01 04:00:00"), "u3", "click"))
    q.processAllAvailable()

    val rows = spark.sql("SELECT key, level FROM fn_out ORDER BY key, level")
      .as[(String, Int)].collect().toSeq
    q.stop()
    // u1: emitted 2 (after batch-1 finalized), then 3; u2: level 0 never
    // emits, then 1 after its view finalizes; u3: 1 after finalization.
    assert(rows == Seq("u1" -> 2, "u1" -> 3, "u2" -> 1, "u3" -> 1))

    // the streamed end-state equals the batch Funnel over the same rows
    val batchRows = Seq(
      (t("2024-01-01 00:00:00"), "u1", "view"),
      (t("2024-01-01 00:05:00"), "u1", "click"),
      (t("2024-01-01 00:05:00"), "u2", "click"),
      (t("2024-01-01 00:30:00"), "u1", "buy"),
      (t("2024-01-01 00:30:00"), "u2", "view"),
      (t("2024-01-01 02:00:00"), "u3", "view"))
      .toDF("ts", "uid", "ev")
    val batch = graft.analysis.Funnel
      .levels(batchRows, "uid", "ts", "ev", steps, 3600.0)
      .as[(String, Int)].collect().toMap
    val streamedFinal = rows.groupBy(_._1).view.mapValues(_.map(_._2).max)
    assert(batch.filter(_._2 > 0) == streamedFinal.toMap)
  }

  test("post-watermark straggler is dropped, not folded out of order") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val stream = mem.toDF().toDF("ts", "uid", "ev")
      .withWatermark("ts", "0 seconds")
    val ups = FunnelStream.levelUpdates(stream, "uid", "ts", "ev",
      steps, windowSeconds = 600.0)
    val q = ups.writeStream.format("memory").queryName("fn_late")
      .outputMode("append").start()
    mem.addData((t("2024-01-01 01:00:00"), "u1", "view"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 02:00:00"), "u1", "view"))
    q.processAllAvailable() // u1's 01:00 view folds; frontier = 01:00
    // straggler click at 01:00:00 — equal-timestamp chains in batch
    // semantics, but the fold frontier already passed it: dropped
    mem.addData((t("2024-01-01 01:00:00"), "u1", "click"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 03:00:00"), "u1", "scroll"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT key, level FROM fn_late")
      .as[(String, Int)].collect().toSeq
    q.stop()
    assert(rows == Seq("u1" -> 1))
  }

  test("idle TTL removes dormant keys; a returning key re-reports") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val stream = mem.toDF().toDF("ts", "uid", "ev")
      .withWatermark("ts", "0 seconds")
    val ups = FunnelStream.levelUpdates(stream, "uid", "ts", "ev",
      steps, windowSeconds = 600.0,
      idleTimeoutSeconds = Some(3600L))
    val q = ups.writeStream.format("memory").queryName("fn_ttl")
      .outputMode("append").start()
    mem.addData(
      (t("2024-01-01 00:00:00"), "u1", "view"),
      (t("2024-01-01 00:01:00"), "u1", "click"))
    q.processAllAvailable()
    // finalize u1 (level 2 emits), then idle far past the 1h TTL
    mem.addData((t("2024-01-01 01:00:00"), "u2", "view"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 06:00:00"), "u2", "scroll"))
    q.processAllAvailable()
    // u1's state was removed at TTL: its fresh view re-reports level 1
    // (the documented at-least-once tradeoff of idleTimeoutSeconds)
    mem.addData((t("2024-01-01 06:10:00"), "u1", "view"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 08:00:00"), "u3", "view"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 09:00:00"), "u3", "click"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT key, level FROM fn_ttl WHERE key = 'u1' ORDER BY at")
      .as[(String, Int)].collect().toSeq
    q.stop()
    assert(rows == Seq("u1" -> 2, "u1" -> 1), s"got $rows")
  }

  test("checkpoint restart CONTINUES the funnel: a chain begun in " +
      "lifetime 1 completes after the restart") {
    // third instance of the recovery pattern (EwmaStream /
    // HeavyHittersStream): same source, file sink, same checkpoint
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("fn_restart").toString
    val mem = MemoryStream[(Timestamp, String, String)]
    def start() = FunnelStream.levelUpdates(
        mem.toDF().toDF("ts", "uid", "ev")
          .withWatermark("ts", "0 seconds"),
        "uid", "ts", "ev", steps, windowSeconds = 3600.0)
      .toDF().writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    val q1 = start()
    // lifetime 1: u1 walks view → click; the chain is OPEN at stop
    mem.addData((t("2024-01-01 00:00:00"), "u1", "view"),
      (t("2024-01-01 00:05:00"), "u1", "click"))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    // lifetime 2: the buy lands IN the same window — a lost-state
    // restart would see a buy with no pending chain and emit nothing
    mem.addData((t("2024-01-01 00:30:00"), "u1", "buy"))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 02:00:00"), "u9", "view"))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 03:00:00"), "u9", "scroll"))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 04:00:00"), "u9", "click"))
    q2.processAllAvailable()
    q2.stop()
    val levels = spark.read.parquet(s"$dir/out")
      .filter($"key" === "u1").orderBy("level")
      .select("level").as[Int].collect().toSeq
    // the full 3-step funnel completed across the restart boundary
    assert(levels.lastOption.contains(3), levels.toString)
  }
}
