package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming drift scores each window against the pinned " +
      "reference, matches the batch twin's terms, and routes unseen " +
      "categories to __other") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "k")
    // reference mix: a:50 b:30 c:20 (the batch corpus)
    val ref = Map("a" -> 50L, "b" -> 30L, "c" -> 20L)
    val out = DriftStream.categoricalDrift(stream, "ts", "k", ref,
      windowSeconds = 60)
    val q = out.writeStream.format("memory").queryName("drift_out")
      .outputMode("complete").start()
    // window 0: a-heavy + a category the reference never saw;
    // window 1 (the next minute): a null key, which must ROUTE to
    // __other — with plain === it would inflate the denominator while
    // landing in no cell
    mem.addData(
      (Seq.fill(7)(t("2024-01-01 00:00:10") -> "a") ++
        Seq.fill(2)(t("2024-01-01 00:00:20") -> "b") ++
        Seq(t("2024-01-01 00:00:30") -> "zz") ++
        Seq(t("2024-01-01 00:01:10") -> "a",
          t("2024-01-01 00:01:20") -> null)): _*)
    q.processAllAvailable()
    val all = spark.sql(
      "SELECT window_start, category, n_cur, p_ref, p_cur, kl_term, " +
        "chi2_term FROM drift_out ORDER BY window_start, category")
      .as[(Timestamp, String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    q.stop()
    val rows = all.filter(_._1 == t("2024-01-01 00:00:00"))
      .map(r => (r._2, r._3, r._4, r._5, r._6, r._7))
    assert(rows.map(_._1) == Seq("__other", "a", "b", "c"))
    val byCat = rows.map(r => r._1 -> r).toMap
    assert(byCat("__other")._2 == 1L) // zz routed to the other-cell
    assert(byCat("a")._2 == 7L && byCat("c")._2 == 0L)
    // the null key in window 1 counts in __other AND in the total
    val w1 = all.filter(_._1 == t("2024-01-01 00:01:00"))
      .map(r => r._2 -> r._3).toMap
    assert(w1("__other") == 1L && w1("a") == 1L, w1.toString)
    // the batch twin computes the same terms for the same two
    // histograms over the same union category set
    val refDf = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(20)("c")).toDF("k")
    val curDf = (Seq.fill(7)("a") ++ Seq.fill(2)("b") ++ Seq("zz"))
      .toDF("k")
    val batch = graft.analysis.Drift
      .categoricalDrift(refDf, curDf, "k")
      .orderBy("k").collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("kl_term")))
      .toMap
    // identical category mix, modulo the name of the unseen cell and
    // the K the smoothing divides by (batch unions observed cats —
    // also 4 here — so terms line up exactly for shared categories)
    assert(math.abs(byCat("a")._5 - batch("a")) < 1e-9,
      s"${byCat("a")._5} vs ${batch("a")}")
    assert(math.abs(byCat("b")._5 - batch("b")) < 1e-9)
    assert(math.abs(byCat("c")._5 - batch("c")) < 1e-9)
    assert(math.abs(byCat("__other")._5 - batch("zz")) < 1e-9)
  }

  test("row-for-row parity with the batch twin on identical rows — " +
      "null and unseen keys riding the __other routing, absent " +
      "reference categories reporting zero cells") {
    implicit val sc = spark.sqlContext
    val ref = Map("a" -> 50L, "b" -> 30L, "c" -> 20L)
    // one window's rows: a-heavy, one unseen key, one null, NO "c"
    val keys = Seq("a", "a", "a", "b", "zz", null, "a")
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "k")
    val out = DriftStream.categoricalDrift(stream, "ts", "k", ref,
      windowSeconds = 60)
    val q = out.writeStream.format("memory").queryName("drift_par")
      .outputMode("complete").start()
    mem.addData(keys.map(k => (t("2024-01-01 00:00:10"), k)): _*)
    q.processAllAvailable()
    val streamRows = spark.sql(
      "SELECT category, n_cur, p_ref, p_cur, kl_term, chi2_term " +
        "FROM drift_par ORDER BY category")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    q.stop()
    // the batch twin on the SAME rows, the stream's routing applied
    // up front (null / unseen → __other — the contract under test)
    val refDf = ref.toSeq.flatMap { case (k, n) =>
      Seq.fill(n.toInt)(k) }.toDF("k")
    val curDf = keys
      .map(k => if (k == null || !ref.contains(k)) "__other" else k)
      .toDF("k")
    val batchRows = graft.analysis.Drift
      .categoricalDrift(refDf, curDf, "k")
      .select("k", "n_cur", "p_ref", "p_cur", "kl_term", "chi2_term")
      .orderBy("k")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(streamRows.map(_._1) == Seq("__other", "a", "b", "c"))
    assert(streamRows == batchRows,
      s"stream $streamRows\nbatch  $batchRows")
  }

  test("numericDrift matches the batch psiDrift twin row-for-row on " +
      "identical rows — same bins, clamping, and smoothing") {
    implicit val sc = spark.sqlContext
    // reference: 1..100 → 10 equal-width bins of 10 each
    val refVals = (1 to 100).map(_.toDouble)
    val refDf = refVals.map(v => ("s", v)).toDF("k", "v")
    val refCounts = Seq.fill(10)(10L)
    // one window of shifted current values, including out-of-range
    // ones that must clamp into the edge bins
    val curVals = (51 to 140).map(_.toDouble) :+ -5.0
    val mem = MemoryStream[(Timestamp, Double)]
    val stream = mem.toDF().toDF("ts", "x")
    val out = DriftStream.numericDrift(stream, "ts", "x",
      lo = 1.0, hi = 100.0, refCounts = refCounts, windowSeconds = 60)
    val q = out.writeStream.format("memory").queryName("ndrift")
      .outputMode("complete").start()
    mem.addData(curVals.map(v => (t("2024-01-01 00:00:10"), v)): _*)
    q.processAllAvailable()
    val streamRows = spark.sql(
      "SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term FROM ndrift " +
        "ORDER BY bin")
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    q.stop()
    val curDf = curVals.map(v => ("s", v)).toDF("k", "v")
    val batchRows = graft.analysis.Drift
      .psiDrift(refDf, curDf, Seq("k"), "v", bins = 10)
      .select("bin", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term")
      .orderBy("bin")
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    assert(streamRows.length == 10)
    assert(streamRows == batchRows,
      s"stream $streamRows\nbatch  $batchRows")
  }

  test("numericDrift parity holds for a bimodal reference with an " +
      "empty bin (emitted by NEITHER twin) and an extreme value that " +
      "must clamp to the edge bin, not int-wrap into an interior one") {
    implicit val sc = spark.sqlContext
    // ref: 1..10 and 90..99 over 3 bins → counts (10, 0, 10)
    val refVals = ((1 to 10) ++ (90 to 99)).map(_.toDouble)
    val refDf = refVals.map(v => ("s", v)).toDF("k", "v")
    // cur avoids the middle bin; 1e15 must CLAMP into bin 2
    val curVals = Seq(1.0, 2.0, 3.0, 1e15)
    val mem = MemoryStream[(Timestamp, Double)]
    val stream = mem.toDF().toDF("ts", "x")
    val out = DriftStream.numericDrift(stream, "ts", "x",
      lo = 1.0, hi = 99.0, refCounts = Seq(10L, 0L, 10L),
      windowSeconds = 60)
    val q = out.writeStream.format("memory").queryName("ndrift2")
      .outputMode("complete").start()
    mem.addData(curVals.map(v => (t("2024-01-01 00:00:10"), v)): _*)
    q.processAllAvailable()
    val streamRows = spark.sql(
      "SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term FROM ndrift2 " +
        "ORDER BY bin")
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    q.stop()
    val batchRows = graft.analysis.Drift
      .psiDrift(refDf, curVals.map(v => ("s", v)).toDF("k", "v"),
        Seq("k"), "v", bins = 3)
      .select("bin", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term")
      .orderBy("bin")
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    // two rows: the empty-both middle bin appears in neither twin
    assert(streamRows.map(_._1) == Seq(0, 2), streamRows.toString)
    assert(streamRows == batchRows,
      s"stream $streamRows\nbatch  $batchRows")
    // the extreme value landed in the EDGE bin
    assert(streamRows.last._3 == 1L)
  }

  test("numericDrift checkpoint restart CONTINUES the open window's " +
      "bin counts across a stop/start cycle") {
    // the EwmaStreamSpec recovery pattern (fault-tolerant sink, same
    // source, identical graph, same checkpointLocation) applied to
    // the windowed-agg bin-cell state
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("drift_restart").toString
    val mem = MemoryStream[(Timestamp, Double)]
    def start() = DriftStream.numericDrift(
        mem.toDF().toDF("ts", "v"), "ts", "v",
        lo = 0.0, hi = 10.0, refCounts = Seq(5L, 5L),
        windowSeconds = 60)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    // ---- lifetime 1: two bin-0 values, window stays open
    val q1 = start()
    mem.addData((t("2024-01-01 00:00:10"), 1.0),
      (t("2024-01-01 00:00:20"), 2.0))
    q1.processAllAvailable()
    q1.stop()

    // ---- lifetime 2: one bin-1 value into the SAME window, then
    // sentinels close it
    val q2 = start()
    mem.addData((t("2024-01-01 00:00:30"), 8.0))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:10:00"), 5.0))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:20:00"), 5.0))
    q2.processAllAvailable()
    q2.stop()
    val w0 = spark.read.parquet(s"$dir/out")
      .filter($"window_start" === t("2024-01-01 00:00:00"))
      .orderBy("bin").select("bin", "n_ref", "n_cur")
      .as[(Int, Long, Long)].collect().toSeq
    // a lost window state would answer (bin 0 -> 0, bin 1 -> 1);
    // recovery carries the lifetime-1 counts into the same window
    assert(w0 == Seq((0, 5L, 2L), (1, 5L, 1L)), w0.toString)
  }

  test("categoricalDrift checkpoint restart CONTINUES the open " +
      "window's category cells across a stop/start cycle") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("cdrift_restart").toString
    val mem = MemoryStream[(Timestamp, String)]
    def start() = DriftStream.categoricalDrift(
        mem.toDF().toDF("ts", "k"), "ts", "k",
        Map("a" -> 50L, "b" -> 50L), windowSeconds = 60)
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    val q1 = start()
    mem.addData((t("2024-01-01 00:00:10"), "a"),
      (t("2024-01-01 00:00:15"), "a"),
      (t("2024-01-01 00:00:20"), "a"))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    mem.addData((t("2024-01-01 00:00:30"), "b"))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:10:00"), "a"))
    q2.processAllAvailable()
    mem.addData((t("2024-01-01 00:20:00"), "a"))
    q2.processAllAvailable()
    q2.stop()
    val w0 = spark.read.parquet(s"$dir/out")
      .filter($"window_start" === t("2024-01-01 00:00:00"))
      .orderBy("category").select("category", "n_cur")
      .as[(String, Long)].collect().toSeq
    // recovery: a=3 from lifetime 1 + b=1 from lifetime 2 in ONE row
    // set; a lost state would answer a=0
    assert(w0 == Seq(("__other", 0L), ("a", 3L), ("b", 1L)),
      w0.toString)
  }
}
