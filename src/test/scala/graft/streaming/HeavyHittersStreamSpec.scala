package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("SpaceSaving windowed top-k: exact (err = 0) when distinct " +
      "keys fit the capacity — row-for-row parity with a batch " +
      "groupBy-count — and null keys count under __null") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "k")
    val out = HeavyHittersStream.topK(stream, "ts", "k",
      windowSeconds = 60, capacity = 8, k = 3)
    val q = out.writeStream.format("memory").queryName("hh_out")
      .outputMode("append").start()
    val w0 = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d") ++
      Seq(null)
    mem.addData(w0.map(k => (t("2024-01-01 00:00:10"), k)): _*)
    q.processAllAvailable()
    // advance the watermark past the window end to close it
    mem.addData((t("2024-01-01 00:05:00"), "z"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:10:00"), "z"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT key, cnt, err, rank FROM hh_out " +
        "WHERE window_start = TIMESTAMP '2024-01-01 00:00:00' " +
        "ORDER BY rank")
      .as[(String, Long, Long, Int)].collect().toSeq
    q.stop()
    // 6 distinct keys (__null included) < capacity 8 → exact counts
    assert(rows == Seq(("a", 5L, 0L, 1), ("b", 3L, 0L, 2),
      ("__null", 1L, 0L, 3)))
    // batch twin agrees on the same rows
    val batch = w0.map(k => Option(k).getOrElse("__null"))
      .toDF("k").groupBy("k").count()
      .orderBy(org.apache.spark.sql.functions.desc("count"),
        org.apache.spark.sql.functions.col("k"))
      .limit(3).as[(String, Long)].collect().toSeq
    assert(rows.map(r => (r._1, r._2)) == batch)
  }

  test("over capacity, every count overestimates by at most err and " +
      "a genuinely heavy key is never evicted") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "k")
    val out = HeavyHittersStream.topK(stream, "ts", "k",
      windowSeconds = 60, capacity = 4, k = 4)
    val q = out.writeStream.format("memory").queryName("hh_cap")
      .outputMode("append").start()
    // heavy key (20 of 'h'), then a parade of 12 singletons that
    // churn the low counters
    val data = Seq.fill(20)("h") ++ (1 to 12).map(i => s"one$i")
    mem.addData(data.map(k => (t("2024-01-01 00:00:30"), k)): _*)
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:05:00"), "z"))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:10:00"), "z"))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT key, cnt, err FROM hh_cap " +
        "WHERE window_start = TIMESTAMP '2024-01-01 00:00:00'")
      .as[(String, Long, Long)].collect().toSeq
    q.stop()
    assert(rows.nonEmpty)
    val h = rows.find(_._1 == "h").get
    assert(h._2 >= 20L)          // never undercounts
    assert(h._2 - h._3 <= 20L)   // cnt − err lower-bounds the truth
    // SpaceSaving invariant: every reported cnt ≥ its err, and the
    // total stream length bounds every count
    assert(rows.forall(r => r._2 >= r._3 && r._2 <= 32L))
  }

  test("checkpoint restart CONTINUES the SpaceSaving summary: counts " +
      "fed before the stop survive into the window's final ranking") {
    // the EwmaStreamSpec recovery pattern applied to the second
    // stateful operator: same MemoryStream instance, file sink,
    // identical graph, same checkpointLocation
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("hh_restart").toString
    val mem = MemoryStream[(Timestamp, String)]
    def start() = HeavyHittersStream.topK(mem.toDF().toDF("ts", "k"),
        "ts", "k", windowSeconds = 60, capacity = 8, k = 2)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    val q1 = start()
    // 5 of 'a' arrive in lifetime 1; the window stays OPEN
    mem.addData(Seq.fill(5)("a").map(k =>
      (t("2024-01-01 00:00:10"), k)): _*)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    // lifetime 2 adds 3 of 'b' to the SAME window, then closes it
    mem.addData(Seq.fill(3)("b").map(k =>
      (t("2024-01-01 00:00:20"), k)): _*)
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:05:00"), "z"))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:10:00"), "z"))
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(s"$dir/out")
      .filter($"window_start" ===
        Timestamp.valueOf("2024-01-01 00:00:00"))
      .orderBy("rank")
      .select("key", "cnt", "err", "rank")
      .as[(String, Long, Long, Int)].collect().toSeq
    // a lost-state restart would rank only 'b'; the recovered summary
    // still holds lifetime 1's five 'a's, exact (err 0)
    assert(rows == Seq(("a", 5L, 0L, 1), ("b", 3L, 0L, 2)), rows)
  }
}
