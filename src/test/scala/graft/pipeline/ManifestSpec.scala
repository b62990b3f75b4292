package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The manifest-committed artifact layout ([[Manifest]]) — the
  * object-store-safe twin of [[Artifacts]]'s rename swap. Proves the
  * four lifecycle verbs row-identical to their rename-mode semantics
  * (append/upsert, compact, retract, rebuild), re-proves the
  * CompactionSpec/RetractionSpec crash cases RENAME-LESSLY (every
  * crash window resolves by garbage collection alone — no restore
  * arm), and — via [[RenameAuditFileSystem]] — proves the layout's
  * only in-place mutation is the single-FILE `_MANIFEST` replace (the
  * primitive an object PUT provides), where the [[Artifacts]] swap
  * demands whole-DIRECTORY renames. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val corpus = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2L -> "completely different text about spark query engines and shuffles",
    3L -> "a document about watermarks and state stores in streaming jobs",
    4L -> "another piece mentioning parquet bucketing and broadcast joins")
    .toDF("doc_id", "text")

  private def sigs(df: DataFrame): DataFrame =
    Dedup.signatureStore(df, "doc_id", "text")

  test("append/rows round-trip; upsert-by-value makes a replayed " +
      "batch idempotent; the partition value filters by column") {
    val dir = Files.createTempDirectory("manifest_rt").toString
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") <= 2)),
      -1L)
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") === 3)),
      0L)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus.filter(col("doc_id") <= 3))))
    // the value rides as a data column — the own-batch exclusion shape
    assert(sortedRows(Manifest.rows(spark, dir)
        .filter(col("batch") =!= 0L).drop("batch")) ==
      sortedRows(sigs(corpus.filter(col("doc_id") <= 2))))

    // a replayed batch 0 (crash after manifest commit, before the
    // checkpoint commit) REPLACES its prior entry — no duplicates
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") === 3)),
      0L)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus.filter(col("doc_id") <= 3))))
    val st = Manifest.state(spark, dir)
    assert(st.entries.map(_.value).sorted == Seq(-1L, 0L))
    // the replaced generation is unreferenced debris; gc removes it
    assert(Manifest.gc(spark, dir) == 1)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus.filter(col("doc_id") <= 3))))
  }

  test("compact preserves the row multiset and keep/drop, collapses " +
      "to one generation, and is idempotent — the CompactionSpec " +
      "contract, rename-less") {
    val dir = Files.createTempDirectory("manifest_compact").toString
    Seq(-1L -> corpus.filter(col("doc_id") <= 2),
        0L -> corpus.filter(col("doc_id") === 3),
        1L -> corpus.filter(col("doc_id") === 4))
      .foreach { case (v, df) =>
        Manifest.append(spark, dir, sigs(df), v) }
    def store(): DataFrame = Manifest.rows(spark, dir).drop("batch")
    val probe = Seq(
      100L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa xx",
      103L -> "a genuinely novel document mentioning nothing seen before now")
      .toDF("doc_id", "text")
    def keeps(): Set[Long] =
      Dedup.dedupAgainstStore(probe, "doc_id", "text", store(),
        minJaccard = 0.5).select("doc_id").as[Long].collect().toSet
    val rowsBefore = sortedRows(store())
    assert(keeps() == Set(103L))

    Manifest.compact(spark, dir)
    val st = Manifest.state(spark, dir)
    assert(st.entries.map(_.value) == Seq(-1L))
    assert(sortedRows(store()) == rowsBefore)
    assert(keeps() == Set(103L))
    Manifest.compact(spark, dir) // idempotent
    assert(sortedRows(store()) == rowsBefore)
    // exactly one gen- directory remains on disk (old ones GC'd)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("gen-")) == 1)
  }

  test("retract == rebuild from the surviving corpus, rewrites only " +
      "hit generations, and commits atomically — the RetractionSpec " +
      "contract, rename-less") {
    val dir = Files.createTempDirectory("manifest_retract").toString
    Seq(-1L -> corpus.filter(col("doc_id") <= 2),
        0L -> corpus.filter(col("doc_id") === 3),
        1L -> corpus.filter(col("doc_id") === 4))
      .foreach { case (v, df) =>
        Manifest.append(spark, dir, sigs(df), v) }
    def genFiles(value: Long): Map[String, Long] = {
      val st = Manifest.state(spark, dir)
      val p = st.entries.find(_.value == value).get.path
      new java.io.File(s"$dir/$p").listFiles().toSeq
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val untouchedSeed = genFiles(-1L)
    val untouched1 = genFiles(1L)

    val removed = Manifest.retract(spark, dir,
      Seq(3L, 999L).toDF("doc_id"), "doc_id")
    assert(removed == 1L)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus.filter(col("doc_id") =!= 3L))))
    // untouched generations kept their files byte-identical
    assert(genFiles(-1L) == untouchedSeed)
    assert(genFiles(1L) == untouched1)
    // the hit generation keeps its VALUE but points at a fresh dir
    val st = Manifest.state(spark, dir)
    assert(st.entries.map(_.value).sorted == Seq(-1L, 0L, 1L))
    assert(st.entries.find(_.value == 0L).get.rows == 0L)
  }

  test("every crash window resolves by gc alone — no restore arm, no " +
      "directory rename: the reader is never wrong in ANY " +
      "intermediate state") {
    val dir = Files.createTempDirectory("manifest_crash").toString
    Manifest.append(spark, dir, sigs(corpus), -1L)
    val rowsBefore = sortedRows(Manifest.rows(spark, dir).drop("batch"))

    // crashed compact/append/rebuild: a fully- or half-written gen-
    // directory exists but the manifest never committed. The reader
    // reads THROUGH the manifest, so it is unaffected even before gc.
    sigs(corpus).withColumn("batch", lit(-1L))
      .write.parquet(s"$dir/gen--1-deadbeef")
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      rowsBefore)
    // a crashed commit: the temp manifest was written, the atomic
    // replace never happened — also invisible, also gc debris
    Files.write(java.nio.file.Paths.get(dir, "_MANIFEST.tmp-crashed"),
      "graft-manifest\t1\t99\tbatch\n".getBytes)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      rowsBefore)
    assert(Manifest.gc(spark, dir) == 2)
    assert(Manifest.gc(spark, dir) == 0) // idempotent
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      rowsBefore)

    // crashed retract: survivors rewritten to a fresh dir, manifest
    // not committed — the retraction simply hasn't happened yet
    sigs(corpus.filter(col("doc_id") =!= 3L))
      .withColumn("batch", lit(-1L))
      .write.parquet(s"$dir/gen--1-cafe0000")
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      rowsBefore)
    assert(Manifest.gc(spark, dir) == 1)
    // re-running the retraction completes it
    assert(Manifest.retract(spark, dir, Seq(3L).toDF("doc_id"),
      "doc_id") == 1L)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus.filter(col("doc_id") =!= 3L))))
  }

  test("adopt migrates a batch=N layout in place, folds it to one " +
      "base, and resumes after a crash between its two commits") {
    val dir = Files.createTempDirectory("manifest_adopt").toString
    sigs(corpus.filter(col("doc_id") <= 2))
      .write.parquet(s"$dir/batch=-1")
    sigs(corpus.filter(col("doc_id") > 2))
      .write.parquet(s"$dir/batch=0")
    val expect = sortedRows(sigs(corpus))
    Manifest.adopt(spark, dir)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) == expect)
    val st = Manifest.state(spark, dir)
    assert(st.entries.map(_.value) == Seq(-1L))
    // pre-adoption dirs are gone (folded + gc'd)
    assert(!new java.io.File(s"$dir/batch=-1").exists())
    assert(!new java.io.File(s"$dir/batch=0").exists())

    // crash between adopt's two commits: manifest points at the old
    // batch=N dirs; re-running adopt resumes the fold
    val dir2 = Files.createTempDirectory("manifest_adopt2").toString
    sigs(corpus.filter(col("doc_id") <= 2))
      .write.parquet(s"$dir2/batch=-1")
    sigs(corpus.filter(col("doc_id") > 2))
      .write.parquet(s"$dir2/batch=0")
    // hand-build the intermediate state: commit #1 only
    Files.write(java.nio.file.Paths.get(dir2, "_MANIFEST"),
      "graft-manifest\t1\t1\tbatch\n-1\tbatch=-1\t2\n0\tbatch=0\t2\n"
        .getBytes)
    Manifest.adopt(spark, dir2)
    assert(sortedRows(Manifest.rows(spark, dir2).drop("batch")) ==
      expect)
    assert(Manifest.state(spark, dir2).entries.map(_.value) == Seq(-1L))
  }

  test("gc with a minAge horizon defers deletion of fresh debris " +
      "(concurrent-reader deployments) and collects it once aged") {
    val dir = Files.createTempDirectory("manifest_age").toString
    Manifest.append(spark, dir, sigs(corpus), -1L)
    sigs(corpus).withColumn("batch", lit(-1L))
      .write.parquet(s"$dir/gen--1-debris00")
    // fresh debris survives a horizon-gated sweep …
    assert(Manifest.gc(spark, dir, minAgeMs = 3600000L) == 0)
    assert(new java.io.File(s"$dir/gen--1-debris00").exists())
    // … and the immediate single-actor sweep collects it
    assert(Manifest.gc(spark, dir) == 1)
  }

  test("layout MIGRATION under a live checkpoint: partitioned ingest, " +
      "clean stop, adopt both artifacts, startManifest resumes the " +
      "SAME checkpoint, and keep/drop continues as if never migrated") {
    val root = Files.createTempDirectory("manifest_migrate").toString
    val (inDir, storeDir, outDir, ckpt) =
      (s"$root/in", s"$root/store", s"$root/out", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val tmp = java.nio.file.Paths.get(inDir, s".$name.tmp")
      Files.write(tmp, lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, java.nio.file.Paths.get(inDir, name))
      ()
    }
    def doc(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text"}"""
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(inDir)

    // phase 1: the PARTITIONED loop, two batches
    graft.streaming.IngestStream.seed(corpus.limit(1), "doc_id",
      "text", storeDir)
    val q1 = graft.streaming.IngestStream.start(stream(), "doc_id",
      "text", storeDir, outDir, ckpt, minJaccard = 0.5)
    writeFile("b0.json", Seq(
      doc(10L, "a fresh document about watermarks and state stores"),
      doc(11L, "another fresh piece mentioning parquet bucketing today")))
    q1.processAllAvailable()
    writeFile("b1.json", Seq(
      doc(20L, "genuinely new content on codegen and tungsten"),
      doc(21L, "a fresh document about watermarks and state stores zz")))
    q1.processAllAvailable()
    q1.stop()

    // phase 2: migrate BOTH artifacts in place at the clean stop —
    // through the GUARDED verb. First prove the guard: with the
    // newest checkpoint commit deleted, batch 1 looks mid-batch and
    // adoption must refuse (folding it into the base would defeat the
    // replay's own-batchId exclusion and vanish the batch)
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    import scala.jdk.CollectionConverters._
    val newest = Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    val newestBytes = Files.readAllBytes(newest)
    Files.delete(newest)
    Files.deleteIfExists(commits.resolve(s".${newest.getFileName}.crc"))
    val midBatch = intercept[IllegalArgumentException] {
      graft.streaming.IngestStream.adoptArtifacts(spark, storeDir,
        outDir, ckpt)
    }
    assert(midBatch.getMessage.contains("no checkpoint commit"))
    Files.write(newest, newestBytes) // restore the clean stop
    graft.streaming.IngestStream.adoptArtifacts(spark, storeDir,
      outDir, ckpt)
    // the layout guards route each loop — and the rename-layout
    // maintenance verbs — away from the manifest artifact
    val wrong = intercept[IllegalArgumentException] {
      graft.streaming.IngestStream.start(stream(), "doc_id", "text",
        storeDir, outDir, ckpt, minJaccard = 0.5)
    }
    assert(wrong.getMessage.contains("use startManifest"))
    val wrongCompact = intercept[IllegalArgumentException] {
      graft.streaming.IngestStream.compact(spark, storeDir, outDir,
        ckpt)
    }
    assert(wrongCompact.getMessage.contains("use compactManifest"))

    // the policy-gated maintenance helper routes to the manifest
    // path; one fresh base generation per artifact -> nothing to do
    val d = graft.streaming.IngestStream.maybeCompact(spark, storeDir,
      outDir, ckpt, maxPartitions = 4)
    assert(!d.compact && d.partitions == 1)

    // phase 3: the MANIFEST loop resumes the same checkpoint
    val q2 = graft.streaming.IngestStream.startManifest(stream(),
      "doc_id", "text", storeDir, outDir, ckpt, minJaccard = 0.5)
    writeFile("b2.json", Seq(
      // near-dup of a PRE-migration survivor: the adopted store must
      // still match it
      doc(30L, "another fresh piece mentioning parquet bucketing today xx"),
      doc(31L, "entirely unseen sentence about broadcast joins and skew")))
    q2.processAllAvailable()
    q2.stop()
    assert(Manifest.rows(spark, outDir)
        .select("doc_id").as[Long].collect().toSet ==
      Set(10L, 11L, 20L, 31L))
  }

  test("the layout never renames a directory: the whole lifecycle on " +
      "a rename-auditing FS records only committer _temporary moves " +
      "and the single-file _MANIFEST replace; the Artifacts swap on " +
      "the same FS records whole-directory renames") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.audit.impl",
      classOf[RenameAuditFileSystem].getName)
    conf.set("fs.AbstractFileSystem.audit.impl",
      classOf[RenameAuditAbstractFs].getName)
    val local = Files.createTempDirectory("manifest_audit").toString
    val dir = s"audit://$local/artifact"

    RenameAuditFileSystem.reset()
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") <= 2)),
      -1L)
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") === 3)),
      0L)
    Manifest.compact(spark, dir)
    Manifest.retract(spark, dir, Seq(2L).toDF("doc_id"), "doc_id")
    Manifest.rebuild(spark, dir, sigs(corpus))
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus)))
    val offenders = RenameAuditFileSystem.all().filterNot {
      case (src, dst, _) =>
        // the output committer's internal task/job promotion (a
        // deployment swaps the committer on an object store; the
        // LAYOUT's protocol is what's under proof here) …
        src.contains("/_temporary/") || dst.contains("/_temporary/") ||
          // … and the one move the protocol itself makes: the
          // single-FILE manifest replace (≡ an object PUT)
          (src.contains("/_MANIFEST.tmp-") && dst.endsWith("/_MANIFEST"))
    }
    assert(offenders.isEmpty,
      s"unexpected renames: ${offenders.mkString("; ")}")
    // and the manifest replace is a FILE move, never a directory
    assert(RenameAuditFileSystem.all()
      .filter(_._2.endsWith("/_MANIFEST")).forall(!_._3))

    // negative control: the rename-swap layout on the same FS moves
    // whole DIRECTORIES outside _temporary — the object-store hazard
    val swapLocal = Files.createTempDirectory("artifacts_audit").toString
    val swapDir = s"audit://$swapLocal/store"
    sigs(corpus).write.parquet(s"$swapDir/batch=-1")
    RenameAuditFileSystem.reset()
    Artifacts.compactPartitioned(spark, swapDir)
    assert(RenameAuditFileSystem.all().exists { case (src, dst, isDir) =>
      isDir && !src.contains("/_temporary/") &&
        !dst.contains("/_temporary/")
    })
  }

  test("index artifact in manifest form: model and rows swap in ONE " +
      "commit — a staged-but-uncommitted rebuild serves the old pair, " +
      "compaction carries the model, the answer tracks writeIndex") {
    def vec(i: Long): Seq[Double] =
      (0 until 64).map(d => math.sin(i * 64 + d).abs + 0.01)
    val base = (0L until 48L).map(i => (i, vec(i))).toDF("vec_id", "v")
    val copies = (0L until 4L).map(i => (i + 1000L, vec(i)))
      .toDF("vec_id", "v")
    val corpus = base.unionByName(copies)
    val b1 = corpus.filter(col("vec_id") % 2 === 0)
    val b2 = corpus.filter(col("vec_id") % 2 === 1)
    val dir = Files.createTempDirectory("manifest_index").toString +
      "/index"
    val (model, idx1) = Similarity.ivfPqIndex(b1, "vec_id", "v",
      nlist = 4, m = 8, ksub = 8)
    Similarity.writeIndexManifest(spark, dir, model, idx1)
    Manifest.append(spark, dir,
      Similarity.indexBatch(b2, "vec_id", "v", model), 0L)
    val probes = base.filter(col("vec_id") < 4)
    def answer(): Seq[(Long, Long)] = {
      val (m2, idx) = Similarity.readIndexManifest(spark, dir)
      Similarity.knnIvfPqOnIndex(probes, idx, corpus, "vec_id", "v",
        m2, k = 1, nprobe = 2, shortlist = 32)
        .select("probe_id", "neighbor_id").as[(Long, Long)]
        .collect().sorted.toSeq
    }
    val expect = (0L until 4L).map(i => (i, i + 1000L))
    assert(answer() == expect)
    val rowsBefore = sortedRows(Manifest.rows(spark, dir).drop("batch"))

    // compaction folds generations, the @model property rides through
    Similarity.compactIndexManifest(spark, dir)
    assert(Manifest.state(spark, dir).entries.size == 1)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      rowsBefore)
    assert(answer() == expect)

    // crashed rebuild: a NEW model directory staged, commit never
    // happened — the artifact still serves the OLD (model, rows) pair
    // together, and gc sweeps the staged dir
    val modelBefore = Manifest.state(spark, dir).props("model")
    Similarity.ivfPqIndex(corpus, "vec_id", "v",
        nlist = 8, m = 8, ksub = 8)._1
      .toFrame(spark).write.parquet(s"$dir/model-deadbeef")
    assert(Manifest.state(spark, dir).props("model") == modelBefore)
    assert(answer() == expect)
    assert(Manifest.gc(spark, dir) == 1)
    assert(!new java.io.File(s"$dir/model-deadbeef").exists())

    // the committed rebuild swaps both at once (new model trained on
    // the full corpus; planted copies keep the answer pinned)
    Similarity.rebuildIndexManifest(spark, dir, corpus, "vec_id",
      "v", nlist = 8, m = 8, ksub = 8)
    assert(Manifest.state(spark, dir).props("model") != modelBefore)
    assert(answer() == expect)
    // exactly one model dir + one gen dir remain
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_.startsWith("model-")) == 1)
    assert(names.count(_.startsWith("gen-")) == 1)
  }

  test("versioned commit mode: the WHOLE lifecycle runs on a store " +
      "that rejects file rename outright — every commit a conditional " +
      "create, readers resolve the highest complete version, gc keeps " +
      "only the current one; rename-mode commit fails on the same " +
      "store (negative control)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.norename.impl", classOf[NoRenameFileSystem].getName)
    conf.set("fs.AbstractFileSystem.norename.impl",
      classOf[NoRenameAbstractFs].getName)
    val local = Files.createTempDirectory("manifest_norename").toString
    val dir = s"norename://$local/artifact"

    Manifest.init(spark, dir, "batch", Manifest.VersionedCommit)
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") <= 2)),
      -1L)
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") === 3)),
      0L)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus.filter(col("doc_id") <= 3))))
    Manifest.compact(spark, dir)
    assert(Manifest.retract(spark, dir, Seq(2L).toDF("doc_id"),
      "doc_id") == 1L)
    Manifest.rebuild(spark, dir, sigs(corpus))
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus)))
    // gc keeps exactly the current version file; superseded versions
    // (and their crc sidecars, if the FS wrote any) are debris
    val st = Manifest.state(spark, dir)
    val names = new java.io.File(s"$local/artifact").listFiles()
      .map(_.getName).filter(_.startsWith("_MANIFEST"))
    assert(names.toSeq == Seq(s"_MANIFEST.v${st.version}"))

    // a torn NEWER version (crashed or in-flight commit) is invisible
    // to readers — they resolve the last complete version
    val rowsNow = sortedRows(Manifest.rows(spark, dir).drop("batch"))
    Files.write(java.nio.file.Paths.get(s"$local/artifact",
      s"_MANIFEST.v${st.version + 1}"),
      "graft-manifest\t1\t999\tbatch\n-1\tgen-missing\t7\n".getBytes)
    assert(Manifest.state(spark, dir).version == st.version)
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      rowsNow)
    // …and the next real commit replaces its own torn attempt
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") === 1)),
      5L)
    assert(Manifest.state(spark, dir).version == st.version + 1)
    assert(Manifest.state(spark, dir).entries.exists(_.value == 5L))

    // negative control: a rename-mode artifact cannot even commit here
    val rdir = s"norename://$local/rename_artifact"
    val boom = intercept[Exception] {
      Manifest.append(spark, rdir, sigs(corpus), -1L)
    }
    assert(boom.getMessage != null &&
      boom.getMessage.contains("no rename"))
  }

  test("single-maintainer contract is CHECKED: two interleaved " +
      "maintainers derive from the same version — the second commit " +
      "fails loudly in BOTH modes, the artifact keeps the first " +
      "commit's rows") {
    // rename mode
    val dir = Files.createTempDirectory("manifest_occ").toString
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") <= 2)),
      -1L)
    val loaded = Manifest.state(spark, dir) // both maintainers load v1
    // maintainer A commits an append
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") === 3)),
      0L)
    // maintainer B, still holding v1, tries to publish its own v2
    val stale = Manifest.State(loaded.version + 1, loaded.partitionCol,
      loaded.entries, loaded.props)
    val e = intercept[IllegalStateException] {
      Manifest.commit(spark, dir, stale)
    }
    assert(e.getMessage.contains("concurrent maintainer"))
    // A's committed rows are intact — B could fail, not clobber
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus.filter(col("doc_id") <= 3))))

    // versioned mode: the conditional create IS the check
    val vdir = Files.createTempDirectory("manifest_occ_v").toString
    Manifest.init(spark, vdir, "batch", Manifest.VersionedCommit)
    Manifest.append(spark, vdir, sigs(corpus.filter(col("doc_id") <= 2)),
      -1L)
    val vloaded = Manifest.state(spark, vdir)
    Manifest.append(spark, vdir,
      sigs(corpus.filter(col("doc_id") === 3)), 0L)
    val vstale = Manifest.State(vloaded.version + 1,
      vloaded.partitionCol, vloaded.entries, vloaded.props)
    val ve = intercept[IllegalStateException] {
      Manifest.commit(spark, vdir, vstale)
    }
    assert(ve.getMessage.contains("concurrent maintainer"))
    assert(sortedRows(Manifest.rows(spark, vdir).drop("batch")) ==
      sortedRows(sigs(corpus.filter(col("doc_id") <= 3))))
  }

  test("commit leaves no tmp-sidecar debris: after many appends the " +
      "artifact root holds the manifest, its (at most one) live " +
      "checksum, and the live generations — nothing accumulates " +
      "per-commit") {
    val dir = Files.createTempDirectory("manifest_crc").toString
    (0L until 5L).foreach { v =>
      Manifest.append(spark, dir,
        sigs(corpus.filter(col("doc_id") === 1)), v)
    }
    // raw java.io listing — ChecksumFileSystem HIDES .crc files from
    // FileSystem.listStatus, which is how sidecar debris would stay
    // invisible (round-17 advice). What 5 commits must NOT leave: any
    // `._MANIFEST.tmp-<uuid>.crc` (a per-commit leak grows the root
    // unboundedly at 2 commits per micro-batch). What this Hadoop's
    // LocalFs DOES leave: exactly ONE live `._MANIFEST.crc` —
    // ChecksumFs.renameInternal moves the tmp's sidecar along with
    // the tmp file, so the sidecar tracks the live manifest and the
    // count stays constant. commit's post-rename delete plus gc's
    // dot-tmp pattern cover FileContext bindings that DON'T move it.
    def raw(): Seq[String] =
      new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(!raw().exists(_.contains("_MANIFEST.tmp-")),
      s"tmp debris: ${raw().filter(_.contains("_MANIFEST.tmp-"))}")
    assert(raw().count(_.endsWith(".crc")) <= 1)
    assert(raw().count(_.startsWith("_MANIFEST")) == 1)
  }

  test("gc horizon vs a LIVE concurrent reader: a scan planned from " +
      "the old manifest completes correctly while compact defers gc " +
      "past the horizon; after the horizon the debris is collected") {
    val dir = Files.createTempDirectory("manifest_reader").toString
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") <= 2)),
      -1L)
    Manifest.append(spark, dir, sigs(corpus.filter(col("doc_id") > 2)),
      0L)
    val before = sortedRows(Manifest.rows(spark, dir).drop("batch"))
    // the concurrent reader: plans its scan from the CURRENT manifest
    // (file listing resolved now), materializes only later
    val reader = Manifest.rows(spark, dir).drop("batch")
    // maintenance runs with a reader horizon: the superseded
    // generations outlive the commit by minAge
    Manifest.compact(spark, dir, gcMinAgeMs = 3600000L)
    assert(Manifest.state(spark, dir).entries.map(_.value) == Seq(-1L))
    // the old reader's deferred materialization still answers
    // correctly — its files were not collected
    assert(sortedRows(reader) == before)
    // new readers see the compacted artifact
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) == before)
    // past the horizon (simulated by an immediate sweep) the two
    // superseded generations go
    assert(Manifest.gc(spark, dir) == 2)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("gen-")) == 1)
  }

  test("Maintainer: cached-state appends commit correctly, the cache " +
      "rebuilds across restart (including after EXTERNAL maintenance " +
      "between maintainers), and a contract violation fails loudly " +
      "instead of clobbering") {
    val dir = Files.createTempDirectory("manifest_maint").toString
    val m1 = new Manifest.Maintainer(spark, dir)
    m1.append(sigs(corpus.filter(col("doc_id") <= 2)), -1L)
    m1.append(sigs(corpus.filter(col("doc_id") === 3)), 0L)
    // cached rows == disk rows
    assert(sortedRows(m1.rows().drop("batch")) ==
      sortedRows(Manifest.rows(spark, dir).drop("batch")))

    // "restart": external maintenance runs between maintainers, the
    // fresh maintainer's cache reads the COMMITTED post-maintenance
    // state and continues correctly
    Manifest.compact(spark, dir)
    val m2 = new Manifest.Maintainer(spark, dir)
    m2.append(sigs(corpus.filter(col("doc_id") === 4)), 1L)
    assert(sortedRows(m2.rows().drop("batch")) ==
      sortedRows(sigs(corpus)))
    assert(Manifest.state(spark, dir).entries.map(_.value).sorted ==
      Seq(-1L, 1L))

    // contract violation: m1's cache predates the compaction — its
    // next append must refuse (optimistic version check), and the
    // artifact keeps m2's committed entries
    val e = intercept[IllegalStateException] {
      m1.append(sigs(corpus.filter(col("doc_id") === 1)), 2L)
    }
    assert(e.getMessage.contains("concurrent maintainer"))
    assert(sortedRows(Manifest.rows(spark, dir).drop("batch")) ==
      sortedRows(sigs(corpus)))
  }

  test("startManifest: streaming ingest over manifest artifacts — " +
      "keep/drop matches the partitioned layout, compactManifest's " +
      "guard refuses a checkpoint-lagged batch, restart resumes") {
    val root = Files.createTempDirectory("manifest_ingest").toString
    val (inDir, storeDir, outDir, ckpt) =
      (s"$root/in", s"$root/store", s"$root/out", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val tmp = java.nio.file.Paths.get(inDir, s".$name.tmp")
      Files.write(tmp, lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, java.nio.file.Paths.get(inDir, name))
      ()
    }
    def doc(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text"}"""
    Manifest.append(spark, storeDir, sigs(corpus.limit(1)), -1L)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    def start() = graft.streaming.IngestStream.startManifest(
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
      // near-dup of batch-0's survivor: the store APPEND is live
      doc(21L, "a fresh document about watermarks and state stores zz")))
    q1.processAllAvailable()
    q1.stop()
    def kept(): Set[Long] = Manifest.rows(spark, outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept() == Set(10L, 11L, 20L))

    // compact with the clean checkpoint: guard passes, one generation
    graft.streaming.IngestStream.compactManifest(spark, storeDir,
      outDir, ckpt)
    assert(Manifest.state(spark, storeDir).entries.map(_.value) ==
      Seq(-1L))
    assert(kept() == Set(10L, 11L, 20L))

    // restart on the compacted store: near-dup still drops, fresh
    // keeps — and the manifest guard refuses a checkpoint-lagged batch
    writeFile("b2.json", Seq(
      doc(30L, "another fresh piece mentioning parquet bucketing today xx"),
      doc(31L, "entirely unseen sentence about broadcast joins and skew")))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(kept() == Set(10L, 11L, 20L, 31L))

    val commits = java.nio.file.Paths.get(ckpt, "commits")
    import scala.jdk.CollectionConverters._
    val newest = Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(newest)
    Files.deleteIfExists(commits.resolve(s".${newest.getFileName}.crc"))
    val e = intercept[IllegalArgumentException] {
      graft.streaming.IngestStream.compactManifest(spark, storeDir,
        outDir, ckpt)
    }
    assert(e.getMessage.contains("no checkpoint commit"))
    // finish the replay (upsert-by-value makes it idempotent), stop
    // cleanly — compaction then proceeds and keep/drop is unchanged
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(kept() == Set(10L, 11L, 20L, 31L))
    graft.streaming.IngestStream.compactManifest(spark, storeDir,
      outDir, ckpt)
    assert(Manifest.state(spark, storeDir).entries.map(_.value) ==
      Seq(-1L))
    assert(kept() == Set(10L, 11L, 20L, 31L))

    // retractManifest: the takedown path over both artifacts
    val (sr, dr) = graft.streaming.IngestStream.retractManifest(
      spark, storeDir, outDir, Seq(20L).toDF("doc_id"))
    assert(sr == 1L && dr == 1L)
    assert(kept() == Set(10L, 11L, 31L))
  }

  test("startManifest resumes a HALF-ADOPTED artifact: a crash " +
      "between adopt's two commits leaves entries pointing at " +
      "batch=N dirs — the next start finishes the fold instead of " +
      "dying per-batch on the missing partition column") {
    val root = Files.createTempDirectory("manifest_halfadopt").toString
    val (inDir, storeDir, outDir, ckpt) =
      (s"$root/in", s"$root/store", s"$root/out", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()
    // the pre-adoption layout, with adopt's FIRST commit only (the
    // crash window round-17 advice flagged: Manifest.exists passes,
    // Manifest.rows would read dirs whose `batch` value lives in the
    // directory NAME and fail unresolved-column on every micro-batch)
    sigs(corpus.filter(col("doc_id") <= 2))
      .write.parquet(s"$storeDir/batch=-1")
    sigs(corpus.filter(col("doc_id") > 2))
      .write.parquet(s"$storeDir/batch=0")
    Files.write(java.nio.file.Paths.get(storeDir, "_MANIFEST"),
      "graft-manifest\t1\t1\tbatch\n-1\tbatch=-1\t2\n0\tbatch=0\t2\n"
        .getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val q = graft.streaming.IngestStream.startManifest(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(inDir),
      "doc_id", "text", storeDir, outDir, ckpt, minJaccard = 0.5)
    // the fold completed at start: one proper base generation
    assert(Manifest.state(spark, storeDir).entries.map(_.value) ==
      Seq(-1L))
    assert(!new java.io.File(s"$storeDir/batch=-1").exists())
    // and the loop ingests against the folded store: a near-dup of an
    // adopted doc drops, fresh content keeps
    val tmp = java.nio.file.Paths.get(inDir, ".b0.json.tmp")
    Files.write(tmp, Seq(
      """{"doc_id":10,"text":"a document about watermarks and state stores in streaming jobs zz"}""",
      """{"doc_id":11,"text":"entirely unseen sentence about broadcast joins and skew"}""")
      .mkString("", "\n", "\n").getBytes)
    Files.move(tmp, java.nio.file.Paths.get(inDir, "b0.json"))
    q.processAllAvailable()
    q.stop()
    import spark.implicits._
    assert(Manifest.rows(spark, outDir)
      .select("doc_id").as[Long].collect().toSet == Set(11L))
  }
}
