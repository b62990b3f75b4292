package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class NoveltyStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("per-window novelty: fresh content ~1, a recrawl 0, partial " +
      "overlap matches the batch twin's fractions; keys isolate") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val out = NoveltyStream.monitor(mem.toDF().toDF("ts", "k", "txt"),
      "ts", "k", "txt", windowSeconds = 60, gramN = 2)
    val q = out.writeStream.format("memory").queryName("nov_out")
      .outputMode("append").start()
    // window 0: "a b c" (grams ab, bc — both new) on key s; key z
    // sees the SAME text but its own bloom: also fully novel
    mem.addData(
      (t("2024-01-01 00:00:10"), "s", "a b c"),
      (t("2024-01-01 00:00:20"), "z", "a b c"))
    q.processAllAvailable()
    // window 1: recrawl ("a b c" again → 0 novel) + partial overlap
    // "a b c d" (ab, bc seen; cd new → 1/3)
    mem.addData(
      (t("2024-01-01 00:01:10"), "s", "a b c"),
      (t("2024-01-01 00:01:20"), "s", "a b c d"))
    q.processAllAvailable()
    // watermark sentinels close the windows (previous-batch-max rule)
    mem.addData((t("2024-01-01 00:10:00"), "wm", "x y"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:20:00"), "wm", "x y"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT key, window_start, n_grams, n_novel_est, novelty_est " +
        "FROM nov_out ORDER BY key, window_start")
      .as[(String, Timestamp, Long, Long, Double)].collect().toSeq
    q.stop()
    val s = rows.filter(_._1 == "s")
    assert(s.length == 2, rows.toString)
    assert(s(0)._3 == 2L && s(0)._4 == 2L && s(0)._5 == 1.0)
    // window 1: recrawl contributes (2, 0), the overlap doc (3, 1)
    assert(s(1)._3 == 5L && s(1)._4 == 1L && s(1)._5 == 0.2)
    // key z's bloom is its own: same text, fully novel there
    val z = rows.filter(_._1 == "z")
    assert(z.map(r => (r._3, r._4)) == Seq((2L, 2L)))
  }

  test("checkpoint restart CONTINUES the bloom: grams seen in " +
      "lifetime 1 are NOT novel after the restart") {
    // fourth recovery proof, this one for BINARY (Array[Byte]) state:
    // the bloom's bits must round-trip the state store across a
    // stop/start — a lost bloom would call the recrawl fully novel
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("nov_restart").toString
    val mem = MemoryStream[(Timestamp, String, String)]
    def start() = NoveltyStream.monitor(
        mem.toDF().toDF("ts", "k", "txt"), "ts", "k", "txt",
        windowSeconds = 60, gramN = 2)
      .toDF().writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    val q1 = start()
    mem.addData((t("2024-01-01 00:00:10"), "s", "a b c"))
    q1.processAllAvailable()
    mem.addData((t("2024-01-01 00:05:00"), "wm", "x y"))
    q1.processAllAvailable()
    mem.addData((t("2024-01-01 00:10:00"), "wm", "x y"))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    // the exact recrawl in a LATER window: a recovered bloom answers
    // 0 novel; a lost one would answer 2
    mem.addData((t("2024-01-01 00:20:10"), "s", "a b c"))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:40:00"), "wm", "x y"))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 01:00:00"), "wm", "x y"))
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(s"$dir/out")
      .filter($"key" === "s").orderBy("window_start")
      .select("n_grams", "n_novel_est").as[(Long, Long)]
      .collect().toSeq
    assert(rows == Seq((2L, 2L), (2L, 0L)), rows.toString)
  }

  test("a row later than the lateness bound never re-opens an " +
      "emitted window, but its grams still enter the bloom history") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val out = NoveltyStream.monitor(mem.toDF().toDF("ts", "k", "txt"),
      "ts", "k", "txt", windowSeconds = 60, gramN = 2)
    val q = out.writeStream.format("memory").queryName("nov_late")
      .outputMode("append").start()
    mem.addData((t("2024-01-01 00:00:10"), "s", "a b c"))
    q.processAllAvailable()
    // sentinels push the watermark past window 0 → the (s, w0) row
    // is emitted to the append sink
    mem.addData((t("2024-01-01 00:10:00"), "wm", "x y"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:20:00"), "wm", "x y"))
    q.processAllAvailable()
    // a straggler lands back in the CLOSED window 0: it must not emit
    // a second (s, w0) row. (Spark's watermark filter drops it before
    // the fold — the in-fold closed-bucket guard is belt-and-braces
    // for the lag between the filter predicate and the fold's view of
    // the watermark — so its grams never reach the bloom either, and
    // the 00:30 crawl of the same text counts as novel.)
    mem.addData((t("2024-01-01 00:00:40"), "s", "p q"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:30:10"), "s", "p q"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:50:00"), "wm", "x y"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 01:10:00"), "wm", "x y"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT window_start, n_grams, n_novel_est FROM nov_late " +
        "WHERE key = 's' ORDER BY window_start")
      .as[(Timestamp, Long, Long)].collect().toSeq
    q.stop()
    // exactly ONE row per window_start; w0 keeps its original counts
    assert(rows.map(_._1).distinct.length == rows.length, rows)
    assert(rows == Seq(
      (t("2024-01-01 00:00:00"), 2L, 2L),
      (t("2024-01-01 00:30:00"), 1L, 1L)), rows.toString)
  }

  test("state stays bounded: the bloom never grows and closed " +
      "windows leave the buffer") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val out = NoveltyStream.monitor(mem.toDF().toDF("ts", "k", "txt"),
      "ts", "k", "txt", windowSeconds = 60, gramN = 2,
      bloomBytes = 64)
    val q = out.writeStream.format("memory").queryName("nov_bound")
      .outputMode("append").start()
    // 200 distinct docs over 4 windows through a 64-byte bloom: must
    // run without state growth (the bloom saturates — novelty
    // UNDERCOUNTS, never crashes or overcounts)
    (0 until 4).foreach { w =>
      mem.addData((0 until 50).map(i =>
        (t(f"2024-01-01 00:0$w%01d:10"), "s",
          s"w$w doc$i alpha$i beta$i gamma$i")): _*)
      q.processAllAvailable()
    }
    mem.addData((t("2024-01-01 01:00:00"), "wm", "x y"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 02:00:00"), "wm", "x y"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT n_grams, n_novel_est FROM nov_bound WHERE key = 's'")
      .as[(Long, Long)].collect().toSeq
    q.stop()
    assert(rows.length == 4)
    // never overcounts: novel ≤ grams in every window
    assert(rows.forall(r => r._2 <= r._1 && r._1 > 0))
  }
}
