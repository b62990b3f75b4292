package graft

import org.apache.spark.sql.functions._

/** Evidence main for SCALE.md's bloom big-filter row: builds a bitmap
  * at the module's design point (10⁷ grams × 12 bits ≈ 15 MB — past
  * `literalMaxWords`, so the probe rides the broadcast-variable UDF
  * path) and measures the corpus-gram scan through BOTH spellings of
  * the SAME bitmap:
  *
  *   - literal: the bitmap inlined as a plan literal (forced via
  *     maxLiteralWords = MaxValue) — codegen'd bit tests, but the plan
  *     carries 15 MB through every copy/canonicalize
  *   - broadcast: the shipped-once bitmap probed by the deterministic
  *     UDF — the codegen fence the round-11 verdict asked to price
  *
  * Filter contents are LCG-synthesized hash pairs (deterministic, no
  * Math.random): the probe prices the scan+test cost, matches are the
  * design false-positive rate either way.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.BloomProbe [grams]"
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nGrams = if (args.length > 0) args(0).toInt else 10000000
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = LocalSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    var seed = 987654321L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed
    }
    val t0 = System.nanoTime()
    val pairs = Array.fill(nGrams)((next(), next()))
    val bits = graft.pipeline.Bloom.buildBits(pairs, bitsPerKey = 12,
      numHashes = 5)
    println(f"""{"probe":"bloom_build","grams":$nGrams,"mb":${
      bits.length * 8 / 1e6}%.1f,"sec":${
      (System.nanoTime() - t0) / 1e9}%.2f,"big_path":${
      bits.length > graft.pipeline.Bloom.literalMaxWords}}""")

    val grams = graft.pipeline.Curation.distinctGramFrame(
      spark.read.parquet(s"$dir/documents.parquet"),
      "doc_id", "text", 13)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCorpus = grams.count() // materialize: isolate probe cost
    val h1 = xxhash64(col("__g"))
    val h2 = xxhash64(col("__g"), lit(1L))
    def time(tag: String, maxWords: Int, passes: Int): Unit =
      (1 to passes).foreach { p =>
        val (test, release) =
          graft.pipeline.Bloom.mightContainReleasable(
            grams, bits, h1, h2, 5, maxWords)
        val t = System.nanoTime()
        val hits = grams.filter(test).count()
        println(
          f"""{"probe":"bloom_${tag}_pass$p","corpus_grams":$nCorpus,""" +
          f""""hits":$hits,"sec":${(System.nanoTime() - t) / 1e9}%.2f}""")
        release()
      }
    // the DESIGN path first: broadcast-once + deterministic UDF probe
    time("broadcast", graft.pipeline.Bloom.literalMaxWords, 3)
    // the forbidden spelling, ONCE and guarded: a 15 MB plan literal
    // ships ~125 MB task binaries and can OOM the driver inside AQE
    // plan stringification — the measured reason literalMaxWords exists
    try time("literal", Int.MaxValue, 1)
    catch {
      case e: Throwable => println(
        s"""{"probe":"bloom_literal_pass1","failed":"${
          e.getClass.getSimpleName}"}""")
    }
    grams.unpersist()
    spark.stop()
  }
}
