package graft

import org.apache.spark.sql.SparkSession

/** Scale-probe main: run a named subset of SparkEntry queries against a
  * directory (e.g. the 10x synthesis from scripts/make_scale10.py) with
  * the Bench methodology (untimed warm-up, two passes, per-query min) and
  * print one JSON line per query. Feeds the measured-doubling table in
  * SCALE.md. Run:
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.ScaleProbe q64_... ..."
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // machine-parsed JSON output — see Bench.main's locale note
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q24_minhash_lsh", "q64_promql_rate_sliding",
        "q66_dedup_clusters")
    val spark = LocalSession.get(cpus)

    // total shuffle bytes written, accumulated across completed stages —
    // the scale-probe's shuffle-volume evidence
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up (Janino/JIT + parquet footers), same as Bench
    try {
      SparkEntry.queries.get("q1_agg").foreach(f =>
        f(spark, sfDir).write.format("noop").mode("overwrite").save())
    } catch { case _: Throwable => () }

    names.foreach { n =>
      val a = run(n)
      spark.catalog.clearCache()
      Thread.sleep(500) // let the listener bus drain pass-1 stages
      shuffleBytes.set(0L)
      val b = run(n)
      Thread.sleep(500)
      val shuffleMb = shuffleBytes.get / 1e6
      spark.catalog.clearCache()
      println(f"""{"query":"$n","sec":${math.min(a, b)}%.3f,""" +
        f""""pass2_shuffle_mb":$shuffleMb%.1f,"dir":"$sfDir"}""")
    }
    spark.stop()
  }
}
