package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction of the lifecycle's batch-partitioned artifacts
  * ([[Artifacts.compactPartitioned]] via [[Dedup.compactStore]] /
  * [[Similarity.compactIndex]] / [[graft.streaming.IngestStream.compact]]):
  * the row multiset is preserved exactly, keep/drop and ANN answers are
  * identical against the compacted artifact, the directory count
  * collapses to one base generation, and compaction is idempotent. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def batchDirs(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().toSeq
      .map(_.getName).filter(_.startsWith("batch=")).sorted

  test("compactStore preserves the signature-store row set, collapses " +
      "to one base generation, keeps keep/drop identical, and is " +
      "idempotent") {
    val root = Files.createTempDirectory("compact_store").toString
    val storeDir = s"$root/store"
    // three generations, the q195 shape: seed + two batch appends
    val b1 = docsDf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "completely different text about spark query engines and shuffles")
    val b2 = docsDf(
      10L -> "fresh second-batch document about watermarks and state stores")
    val b3 = docsDf(
      20L -> "third batch content on codegen and tungsten pipelines here")
    Dedup.signatureStore(b1, "doc_id", "text")
      .write.parquet(s"$storeDir/batch=-1")
    Dedup.signatureStore(b2, "doc_id", "text")
      .write.parquet(s"$storeDir/batch=0")
    Dedup.signatureStore(b3, "doc_id", "text")
      .write.parquet(s"$storeDir/batch=1")

    def store(): DataFrame =
      spark.read.option("basePath", storeDir).parquet(storeDir)
        .drop("batch")
    // probe batch: near-dups of docs from ALL three generations plus
    // one fresh doc — keep/drop must not change under compaction
    val probe = docsDf(
      100L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa xx",
      101L -> "fresh second-batch document about watermarks and state stores yy",
      102L -> "third batch content on codegen and tungsten pipelines here zz",
      103L -> "a genuinely novel document mentioning nothing seen before now")
    def keeps(): Set[Long] =
      Dedup.dedupAgainstStore(probe, "doc_id", "text", store(),
        minJaccard = 0.5).select("doc_id").as[Long].collect().toSet

    val rowsBefore = sortedRows(store())
    val keepBefore = keeps()
    assert(keepBefore == Set(103L)) // the three near-dups all drop

    Dedup.compactStore(spark, storeDir)
    assert(batchDirs(storeDir) == Seq("batch=-1"))
    assert(sortedRows(store()) == rowsBefore)
    assert(keeps() == keepBefore)

    // idempotent: compacting the already-compacted base is a no-op on
    // the row set
    Dedup.compactStore(spark, storeDir)
    assert(batchDirs(storeDir) == Seq("batch=-1"))
    assert(sortedRows(store()) == rowsBefore)
  }

  test("rebuildStore re-hashes the corpus under new parameters and " +
      "swaps — the old-k store would be refused, the rebuilt one " +
      "answers") {
    val root = Files.createTempDirectory("rebuild_store").toString
    val storeDir = s"$root/store"
    val d = docsDf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "completely different text about spark query engines and shuffles")
    Dedup.signatureStore(d, "doc_id", "text", k = 8)
      .write.parquet(s"$storeDir/batch=-1")
    val probe = docsDf(100L ->
      "alpha beta gamma delta epsilon zeta eta theta iota kappa xx")
    def store(): org.apache.spark.sql.DataFrame =
      spark.read.option("basePath", storeDir).parquet(storeDir)
        .drop("batch")
    // the k=8 store is refused at k=16 (the width guard's job) …
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstStore(probe, "doc_id", "text", store(),
        k = 16, minJaccard = 0.5).collect()
    }
    assert(e.getMessage.contains("rebuild the store"))
    // … and the rebuild migrates it: same corpus, new k, swap in place
    Dedup.rebuildStore(spark, storeDir, d, "doc_id", "text", k = 16)
    assert(new java.io.File(storeDir).listFiles().map(_.getName).toSeq
      == Seq("batch=-1"))
    assert(Dedup.dedupAgainstStore(probe, "doc_id", "text", store(),
        k = 16, minJaccard = 0.5)
      .select("doc_id").as[Long].collect().isEmpty)
    assert(sortedRows(store()) == sortedRows(
      Dedup.signatureStore(d, "doc_id", "text", k = 16)))
  }

  test("recoverCompaction resolves every documented crash window " +
      "conservatively — the original data always wins") {
    val root = Files.createTempDirectory("recover_compact").toString
    val storeDir = s"$root/store"
    val d = docsDf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    Dedup.signatureStore(d, "doc_id", "text")
      .write.parquet(s"$storeDir/batch=-1")
    val rowsBefore = sortedRows(
      spark.read.option("basePath", storeDir).parquet(storeDir))

    def mv(a: String, b: String): Unit = {
      assert(new java.io.File(a).renameTo(new java.io.File(b)))
      ()
    }
    // window 1: crash BEFORE the first rename — dir intact, stale
    // .compacting leftover
    mkDirCopy(storeDir, s"$storeDir.compacting")
    assert(Artifacts.recoverCompaction(spark, storeDir))
    assert(!new java.io.File(s"$storeDir.compacting").exists())
    assert(sortedRows(spark.read.option("basePath", storeDir)
      .parquet(storeDir)) == rowsBefore)

    // window 2: crash BETWEEN the renames — dir missing, .old holds
    // the original, .compacting holds the (untrusted) new base
    mkDirCopy(storeDir, s"$storeDir.compacting")
    mv(storeDir, s"$storeDir.old")
    assert(Artifacts.recoverCompaction(spark, storeDir))
    assert(new java.io.File(storeDir).exists())
    assert(!new java.io.File(s"$storeDir.old").exists())
    assert(!new java.io.File(s"$storeDir.compacting").exists())
    assert(sortedRows(spark.read.option("basePath", storeDir)
      .parquet(storeDir)) == rowsBefore)

    // idempotent on a healthy dir; false on a truly absent artifact
    assert(Artifacts.recoverCompaction(spark, storeDir))
    assert(!Artifacts.recoverCompaction(spark, s"$root/nowhere"))
  }

  private def mkDirCopy(src: String, dst: String): Unit = {
    def copy(s: java.io.File, t: java.io.File): Unit = {
      if (s.isDirectory) {
        t.mkdirs()
        s.listFiles().foreach(c => copy(c, new java.io.File(t, c.getName)))
      } else {
        java.nio.file.Files.copy(s.toPath, t.toPath)
        ()
      }
    }
    copy(new java.io.File(src), new java.io.File(dst))
  }

  test("compactIndex preserves the (neighbor_id, cell, codes) row set " +
      "and the ANN answer over the persisted index") {
    val root = Files.createTempDirectory("compact_index").toString
    val idxDir = s"$root/index"
    // deterministic vectors; planted exact copies (+1000) so the
    // answer is pinned regardless of the trained model
    def vec(i: Long): Seq[Double] =
      (0 until 64).map(d => math.sin(i * 64 + d).abs + 0.01)
    val base = (0L until 48L).map(i => (i, vec(i))).toDF("vec_id", "v")
    val copies = (0L until 4L).map(i => (i + 1000L, vec(i)))
      .toDF("vec_id", "v")
    val corpus = base.unionByName(copies)
    val (model, idx1) = Similarity.ivfPqIndex(
      corpus.filter(col("vec_id") % 2 === 0), "vec_id", "v",
      nlist = 4, m = 8, ksub = 8)
    idx1.write.parquet(s"$idxDir/batch=-1")
    Similarity.indexBatch(corpus.filter(col("vec_id") % 2 === 1),
      "vec_id", "v", model).write.parquet(s"$idxDir/batch=0")

    def index(): DataFrame =
      spark.read.option("basePath", idxDir).parquet(idxDir).drop("batch")
    val probes = base.filter(col("vec_id") < 4)
    // shortlist 32 ≥ the probed cells' candidate count, so the re-rank
    // is exhaustive within them — coarse ksub=8 codes tie many ADCs
    // and a tight shortlist would tie-break the planted copy out
    def answer(): Seq[(Long, Long)] =
      Similarity.knnIvfPqOnIndex(probes, index(), corpus, "vec_id",
        "v", model, k = 1, nprobe = 2, shortlist = 32)
        .select("probe_id", "neighbor_id").as[(Long, Long)]
        .collect().sorted.toSeq

    val rowsBefore = sortedRows(index())
    val ansBefore = answer()
    assert(ansBefore == (0L until 4L).map(i => (i, i + 1000L)))

    Similarity.compactIndex(spark, idxDir)
    assert(batchDirs(idxDir) == Seq("batch=-1"))
    assert(sortedRows(index()) == rowsBefore)
    assert(answer() == ansBefore)
  }

  test("IngestStream.compact folds store and out, the restarted query " +
      "sees identical keep/drop, and the uncommitted-batch guard " +
      "fails loudly on a crashed checkpoint") {
    val root = Files.createTempDirectory("compact_ingest").toString
    val (inDir, storeDir, outDir, ckpt) =
      (s"$root/in", s"$root/store", s"$root/out", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val tmp = java.nio.file.Paths.get(inDir, s".$name.tmp")
      Files.write(tmp, lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, java.nio.file.Paths.get(inDir, name))
    }
    def doc(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text"}"""
    graft.streaming.IngestStream.seed(docsDf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      "doc_id", "text", storeDir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    def start() = graft.streaming.IngestStream.start(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(inDir),
      "doc_id", "text", storeDir, outDir, ckpt, minJaccard = 0.5)

    val q1 = start()
    writeFile("b0.json", Seq(
      doc(10L, "a fresh document about watermarks and state stores"),
      doc(11L, "another fresh piece mentioning parquet bucketing today")))
    q1.processAllAvailable()
    writeFile("b1.json", Seq(
      doc(20L, "genuinely new content on codegen and tungsten"),
      doc(21L, "a fresh document about watermarks and state stores zz")))
    q1.processAllAvailable()
    q1.stop()
    assert(graft.streaming.IngestStream.keptDocs(spark, outDir)
      .select("doc_id").as[Long].collect().toSet == Set(10L, 11L, 20L))

    // compact with the clean checkpoint: guard passes, dirs collapse
    graft.streaming.IngestStream.compact(spark, storeDir, outDir,
      ckpt)
    assert(batchDirs(storeDir) == Seq("batch=-1"))
    assert(batchDirs(outDir) == Seq("batch=-1"))
    assert(graft.streaming.IngestStream.keptDocs(spark, outDir)
      .select("doc_id").as[Long].collect().toSet == Set(10L, 11L, 20L))

    // restart on the compacted store: a near-dup of a pre-compaction
    // survivor still drops, a fresh doc still keeps — keep/drop is a
    // row-set function and compaction preserved the set
    writeFile("b2.json", Seq(
      doc(30L, "another fresh piece mentioning parquet bucketing today xx"),
      doc(31L, "entirely unseen sentence about broadcast joins and skew")))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$outDir/batch=2")
      .select("doc_id").as[Long].collect().toSet == Set(31L))

    // crash simulation: delete the newest commit marker — batch 2 is
    // now uncommitted, and the guard must refuse to fold it
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    import scala.jdk.CollectionConverters._
    val newest = Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(newest)
    Files.deleteIfExists(commits.resolve(s".${newest.getFileName}.crc"))
    val e = intercept[IllegalArgumentException] {
      graft.streaming.IngestStream.compact(spark, storeDir, outDir,
        ckpt)
    }
    assert(e.getMessage.contains("uncommitted batch partition"))
    // finish the replay, stop cleanly — now compaction proceeds
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    // a PURGED commit log (spark.sql.streaming.minBatchesToRetain
    // drops old markers on long-running queries) must NOT flag old —
    // fully committed — partitions: only ids beyond the NEWEST commit
    // are suspect (batches execute sequentially). Delete the OLDEST
    // marker; the guard below must still pass.
    val oldest = Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .minBy(_.getFileName.toString.toLong)
    Files.delete(oldest)
    Files.deleteIfExists(commits.resolve(s".${oldest.getFileName}.crc"))
    graft.streaming.IngestStream.compact(spark, storeDir, outDir,
      ckpt)
    assert(batchDirs(storeDir) == Seq("batch=-1"))
    assert(graft.streaming.IngestStream.keptDocs(spark, outDir)
      .select("doc_id").as[Long].collect().toSet ==
        Set(10L, 11L, 20L, 31L))
  }
}
