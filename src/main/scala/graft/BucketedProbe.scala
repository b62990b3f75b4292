package graft

import org.apache.spark.sql.functions._

/** Evidence main for SCALE.md's bucketed co-location row: measures the
  * q143 artifact-apply join as (a) plain shuffled joins and (b) reads
  * through [[graft.pipeline.Curation.writeBucketed]] tables, printing
  * per-pass wall time and shuffle bytes. The broadcast threshold is
  * disabled for the plain twin so the measured shape is the
  * corpus-scale one (an artifact frame at 100 TB is itself
  * corpus-sized — broadcasting it is not an option).
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.BucketedProbe"
  */
object BucketedProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = LocalSession.get(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val c = d.unionByName(d.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" zz9")).as("text")))
    val quality = c.select(col("doc_id"),
      round(least(length(col("text")) / lit(1000.0), lit(1.0)), 6)
        .as("qscore"))
    val keeps = graft.pipeline.Dedup.exact(c, "doc_id", "text")
      .select(col("keep_id").as("doc_id"), lit(1L).as("keep"))

    val sb = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          sb.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def time(tag: String)(f: => Unit): Unit = {
      sb.set(0L)
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain (after the clock stops)
      println(f"""{"probe":"$tag","sec":$sec%.3f,"shuffle_mb":${
        sb.get / 1e6}%.1f}""")
    }
    def plainApply(): Unit =
      c.select("doc_id").join(quality, Seq("doc_id"))
        .join(keeps, Seq("doc_id"), "left")
        .select(col("doc_id"), col("qscore"),
          coalesce(col("keep"), lit(0L)).as("keep"))
        .write.format("noop").mode("overwrite").save()

    c.count(); quality.count() // warm-up: footers + codegen
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("plain_join_warm")(plainApply())
    time("bucketed_write_3_tables") {
      graft.pipeline.Curation.writeBucketed(
        c.select("doc_id"), "doc_id", "tw_corpus", 8)
      graft.pipeline.Curation.writeBucketed(
        quality, "doc_id", "tw_quality", 8)
      graft.pipeline.Curation.writeBucketed(
        keeps, "doc_id", "tw_keep", 8)
    }
    (1 to passes).foreach { i =>
      time(s"bucketed_join_pass$i") {
        spark.table("tw_corpus")
          .join(spark.table("tw_quality").hint("merge"), Seq("doc_id"))
          .join(spark.table("tw_keep").hint("merge"),
            Seq("doc_id"), "left")
          .select(col("doc_id"), col("qscore"),
            coalesce(col("keep"), lit(0L)).as("keep"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to passes).foreach(i => time(s"plain_join_pass$i")(plainApply()))
    Seq("tw_corpus", "tw_quality", "tw_keep")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    // ---- snapshot changeset apply: plain vs bucketed (the q155/q160
    // payload join — the base snapshot carries the TEXT through the
    // full-outer join, exactly the shuffle bucketing deletes)
    val base = d
    val changes = base.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id"), lit("d").as("op"),
        lit(null).cast("string").as("text"))
      .unionByName(base
        .filter(col("doc_id") % 7 === 0 && col("doc_id") % 13 =!= 0)
        .select(col("doc_id"), lit("u").as("op"),
          concat(col("text"), lit(" upd")).as("text")))
    // derive + audit the sides ONCE, outside every timed pass, so the
    // plain and bucketed twins measure exactly the payload join
    val (sb2, sc2) = graft.pipeline.Snapshots.changesetSides(
      base, changes, "doc_id", "op", Seq("text"))
    def plainChangeset(): Unit =
      graft.pipeline.Snapshots.mergeChangeset(
          sb2.join(sc2, Seq("doc_id"), "full_outer"),
          "doc_id", Seq("text"))
        .write.format("noop").mode("overwrite").save()
    (1 to passes).foreach(i =>
      time(s"changeset_plain_pass$i")(plainChangeset()))
    time("changeset_bucketed_write_and_join") {
      graft.pipeline.Snapshots.applyChangesetBucketed(base, changes,
          "doc_id", "op", Seq("text"), "tw_snap", 8)
        .write.format("noop").mode("overwrite").save()
    }
    // amortized consumer: re-read the written tables (the recurring
    // crawl's shape — base written once, joined every round)
    (1 to passes).foreach { i =>
      time(s"changeset_bucketed_pass$i") {
        graft.pipeline.Snapshots.mergeChangeset(
            spark.table("tw_snap_base")
              .join(spark.table("tw_snap_changes").hint("merge"),
                Seq("doc_id"), "full_outer"),
            "doc_id", Seq("text"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    Seq("tw_snap_base", "tw_snap_changes")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
