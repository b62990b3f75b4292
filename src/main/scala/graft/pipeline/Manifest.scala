package graft.pipeline

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-committed artifact layout — the object-store-safe twin of
  * [[Artifacts]]'s rename-swap discipline. [[Artifacts]]'s correctness
  * rests on atomic DIRECTORY rename, which real 100-TB deployments
  * don't have: on an object store a directory "rename" is a
  * copy+delete over every key, and each documented crash window
  * becomes a data-loss window. This layout removes the assumption the
  * way table formats do (Iceberg/Delta's core idea, re-expressed at
  * the scale of one artifact): data directories are IMMUTABLE and
  * WRITE-ONCE under fresh unique names, and the single small
  * `_MANIFEST` file — atomically replaced — is the only thing that
  * ever changes. The one primitive required is "replace one small
  * object atomically", which every relevant store offers natively
  * (object PUT; POSIX/HDFS single-FILE rename — what [[commit]]
  * uses here). Directory rename is never used: ManifestSpec proves it
  * by running the whole lifecycle on a rename-auditing FileSystem.
  *
  * Layout under an artifact root `dir`:
  * {{{
  *   dir/_MANIFEST            the committed state (see format below)
  *   dir/gen-<value>-<uuid>/  immutable parquet, one dir per committed
  *                            write; `partitionCol` rides INSIDE the
  *                            rows (constant per dir → parquet RLE +
  *                            row-group stats, so a value filter
  *                            prunes whole files)
  * }}}
  *
  * Manifest format (TSV — one header, optional `@key	path`
  * property lines, one line per live generation):
  * {{{
  *   graft-manifest	1	<version>	<partitionCol>
  *   @<key>	<relative path>
  *   <value>	<relative dir name>	<rows>
  * }}}
  * Properties name auxiliary paths that must swap ATOMICALLY with the
  * row set — the IVF-PQ index's quantizer model is the motivating
  * case: a rebuild retrains the model AND re-encodes every row, and a
  * reader must never see the new model with the old codes (or vice
  * versa); one committed manifest carries both. Property-referenced
  * paths are live for [[gc]] exactly like entry paths.
  *
  * The commit protocol makes every crash window trivially safe, with
  * NO restore step (compare [[Artifacts.recoverCompaction]] /
  * [[Artifacts.recoverRetraction]]'s window-by-window resolution):
  * data is fully written BEFORE the manifest referencing it commits,
  * so the manifest never points at incomplete data, and a crash at
  * any instant leaves the previous manifest — and every directory it
  * references — untouched. Recovery is pure garbage collection
  * ([[gc]]): unreferenced `gen-*` directories are uncommitted debris.
  *
  * A second hazard class disappears with it: a half-written partition
  * is NEVER VISIBLE to readers (it has no manifest entry), so a
  * crash-replayed ingest batch cannot match its own partial rows —
  * the window [[graft.streaming.IngestStream.start]]'s own-batchId
  * exclusion plus [[graft.streaming.IngestStream.compact]]'s
  * uncommitted-batch guard defend in the `batch=N` layout. (The
  * exclusion is still needed for a batch that COMMITTED here but not
  * in the streaming checkpoint — [[append]]'s upsert-by-value makes
  * that replay idempotent, and the value filter keeps it from
  * matching its prior attempt's rows.)
  *
  * Same operational contract as [[Artifacts]]: one maintainer at a
  * time, no concurrent writer. Readers in OTHER processes that loaded
  * an older manifest keep scanning directories [[gc]] may delete —
  * a deployment with concurrent readers defers [[gc]] by a scan
  * horizon (the entries are already gone from the manifest, so no new
  * reader sees them); this sandbox runs maintenance with readers
  * stopped, like the rename layout. */
object Manifest {

  val ManifestFile = "_MANIFEST"

  /** One live generation: the logical partition value (batch id; base
    * generations use -1), the directory name relative to the artifact
    * root, and its committed row count (informational — consumers
    * read the data, the count feeds maintenance reporting). */
  final case class Entry(value: Long, path: String, rows: Long)

  /** The committed state: a monotonically increasing version (debug /
    * audit trail — correctness needs only atomic replacement), the
    * live entries, and auxiliary property paths (see the format note
    * above). */
  final case class State(version: Long, partitionCol: String,
      entries: Seq[Entry], props: Map[String, String] = Map.empty)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir, ManifestFile))

  /** Read the committed state. Fails loudly on a missing manifest —
    * a caller holding the wrong path should hear about it, not get an
    * empty artifact. */
  def state(spark: SparkSession, dir: String): State = {
    val f = fs(spark, dir)
    val p = new Path(dir, ManifestFile)
    require(f.exists(p), s"no $ManifestFile under $dir — not a " +
      "manifest-mode artifact (init/append first, or adopt a " +
      "batch-partitioned layout)")
    val in = f.open(p)
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split('\n').filter(_.nonEmpty).toSeq
    require(lines.nonEmpty, s"empty manifest at $p")
    val head = lines.head.split('\t')
    require(head.length == 4 && head(0) == "graft-manifest" &&
      head(1) == "1", s"unrecognized manifest header at $p: " +
      lines.head)
    val (propLines, entryLines) =
      lines.tail.partition(_.startsWith("@"))
    val props = propLines.map { l =>
      val c = l.split('\t')
      require(c.length == 2, s"bad manifest property at $p: $l")
      c(0).stripPrefix("@") -> c(1)
    }.toMap
    val entries = entryLines.map { l =>
      val c = l.split('\t')
      require(c.length == 3, s"bad manifest line at $p: $l")
      Entry(c(0).toLong, c(1), c(2).toLong)
    }
    State(head(2).toLong, head(3), entries, props)
  }

  /** Atomically replace the manifest: the new state is fully written
    * to a uniquely-named temp FILE, then moved over `_MANIFEST` in one
    * single-object rename with overwrite ([[FileContext]] — atomic on
    * POSIX and HDFS; on an object store this one call is a PUT, which
    * is atomic natively). This is the ONLY mutation the layout ever
    * performs in place; everything else is write-new + GC. */
  private def commit(spark: SparkSession, dir: String, st: State)
      : Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"$ManifestFile.tmp-${UUID.randomUUID()}")
    val body = (
      Seq(s"graft-manifest\t1\t${st.version}\t${st.partitionCol}") ++
        st.props.toSeq.sortBy(_._1).map { case (k, v) => s"@$k\t$v" } ++
        st.entries.map(e => s"${e.value}\t${e.path}\t${e.rows}")
      ).mkString("", "\n", "\n")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc = FileContext.getFileContext(f.getUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(f.makeQualified(tmp),
      f.makeQualified(new Path(dir, ManifestFile)),
      Options.Rename.OVERWRITE)
  }

  /** The artifact's logical rows — every live generation in ONE
    * multi-path parquet scan; `partitionCol` is a real data column
    * (constant per file), so filters on it prune via row-group
    * stats. */
  def rows(spark: SparkSession, dir: String): DataFrame = {
    val st = state(spark, dir)
    require(st.entries.nonEmpty, s"manifest at $dir lists no live " +
      "generations — append before reading")
    spark.read.parquet(st.entries.map(e => s"$dir/${e.path}"): _*)
  }

  /** Append one generation: write `df` (plus the constant
    * `partitionCol = value` column) to a fresh `gen-` directory, then
    * commit a manifest that adds — or REPLACES, upsert-by-value — the
    * entry for `value`. The replacement arm is what makes a
    * crash-replayed ingest batch idempotent: the replay writes a
    * fresh directory, the commit swaps the entry, and the prior
    * attempt's directory becomes unreferenced debris for [[gc]].
    * Creates the manifest if the artifact is new. */
  def append(spark: SparkSession, dir: String, df: DataFrame,
      value: Long, partitionCol: String = "batch"): Unit = {
    require(!df.columns.contains(partitionCol),
      s"frame already carries '$partitionCol' — the layout owns it")
    val st =
      if (exists(spark, dir)) state(spark, dir)
      else State(0L, partitionCol, Nil, Map.empty)
    require(st.partitionCol == partitionCol,
      s"manifest at $dir tracks '${st.partitionCol}', not " +
        s"'$partitionCol'")
    val gen = s"gen-$value-${UUID.randomUUID().toString.take(8)}"
    df.withColumn(partitionCol, lit(value))
      .write.mode("overwrite").parquet(s"$dir/$gen")
    // footer-only count of what actually landed (cheap at maintenance
    // cadence; exact even if df was non-deterministic)
    val n = countParquet(spark, s"$dir/$gen")
    commit(spark, dir, State(st.version + 1, partitionCol,
      st.entries.filterNot(_.value == value) :+ Entry(value, gen, n),
      st.props))
  }

  /** Fold every live generation into one new base generation
    * (`value = baseValue`) — [[Artifacts.compactPartitioned]] without
    * the rename swap: write the full row multiset to a fresh `gen-`
    * directory (the read side scans the OLD generations — the commit
    * hasn't happened), commit a one-entry manifest, GC the old
    * directories. A crash anywhere leaves the prior manifest and all
    * its data untouched; the half-written new base is [[gc]] debris. */
  def compact(spark: SparkSession, dir: String, baseValue: Long = -1L,
      repartitionCols: Seq[String] = Nil, numFiles: Int = 0): Unit = {
    val st = state(spark, dir)
    val n = if (numFiles > 0) numFiles
      else spark.sessionState.conf.numShufflePartitions
    val data = rows(spark, dir).drop(st.partitionCol)
    val shaped =
      if (repartitionCols.nonEmpty)
        data.repartition(n, repartitionCols.map(col): _*)
      else data.repartition(n)
    val gen = s"gen-$baseValue-${UUID.randomUUID().toString.take(8)}"
    shaped.withColumn(st.partitionCol, lit(baseValue))
      .write.mode("overwrite").parquet(s"$dir/$gen")
    // count what LANDED (like every other committing verb) — summing
    // the old entries' counts would silently propagate a bad fold
    // instead of exposing it to maintenance reporting
    commit(spark, dir, State(st.version + 1, st.partitionCol,
      Seq(Entry(baseValue, gen, countParquet(spark, s"$dir/$gen"))),
      st.props))
    gc(spark, dir)
    ()
  }

  /** Replace the whole artifact with `df` as one new base generation —
    * the rebuild verb (parameter migration / quantizer retrain) in
    * manifest form; existing properties carry through. Same crash
    * story as [[compact]]. */
  def rebuild(spark: SparkSession, dir: String, df: DataFrame,
      baseValue: Long = -1L, numFiles: Int = 0): Unit = {
    val st = state(spark, dir)
    replaceAll(spark, dir, df, baseValue, st.partitionCol, numFiles,
      Nil, st.props)
  }

  /** The general whole-artifact swap: write `df` as the single base
    * generation (optionally clustered by `repartitionCols` — the
    * index's `cell`), replace the property map, commit ONCE, GC.
    * Creates the manifest when the artifact is new — the first write
    * of a (rows + auxiliary paths) artifact is the same one-commit
    * swap as its rebuild. Callers stage property paths (e.g. a model
    * directory) under `dir` BEFORE calling; a crash leaves them as
    * unreferenced debris, never a half-swapped artifact. */
  def replaceAll(spark: SparkSession, dir: String, df: DataFrame,
      baseValue: Long, partitionCol: String, numFiles: Int,
      repartitionCols: Seq[String], props: Map[String, String])
      : Unit = {
    val st =
      if (exists(spark, dir)) state(spark, dir)
      else State(0L, partitionCol, Nil, Map.empty)
    require(st.partitionCol == partitionCol,
      s"manifest at $dir tracks '${st.partitionCol}', not " +
        s"'$partitionCol'")
    val n = if (numFiles > 0) numFiles
      else spark.sessionState.conf.numShufflePartitions
    val shaped =
      if (repartitionCols.nonEmpty)
        df.repartition(n, repartitionCols.map(col): _*)
      else df.repartition(n)
    val gen = s"gen-$baseValue-${UUID.randomUUID().toString.take(8)}"
    shaped.withColumn(partitionCol, lit(baseValue))
      .write.mode("overwrite").parquet(s"$dir/$gen")
    val rows = countParquet(spark, s"$dir/$gen")
    commit(spark, dir, State(st.version + 1, partitionCol,
      Seq(Entry(baseValue, gen, rows)), props))
    gc(spark, dir)
    ()
  }

  /** Remove every row whose `idCol` is in `ids`, rewriting ONLY the
    * generations that contain a retracted id (one broadcast semi-join
    * pass finds them; untouched generations keep their files
    * byte-identical). All hit generations are rewritten to fresh
    * directories FIRST, then ONE commit swaps every entry at once —
    * so the retraction is also atomic as a whole: readers see either
    * none of it or all of it, never a half-retracted artifact (the
    * per-partition rename swap can expose one). Returns rows
    * removed. */
  def retract(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String): Long = {
    val st = state(spark, dir)
    val idsB = broadcast(ids.select(col(idCol)).distinct())
    val hits = rows(spark, dir)
      .join(idsB, Seq(idCol), "left_semi")
      .groupBy(col(st.partitionCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (hits.isEmpty) return 0L
    val rewritten = st.entries.map { e =>
      if (!hits.contains(e.value)) e
      else {
        val gen =
          s"gen-${e.value}-${UUID.randomUUID().toString.take(8)}"
        spark.read.parquet(s"$dir/${e.path}")
          .join(idsB, Seq(idCol), "left_anti")
          .write.mode("overwrite").parquet(s"$dir/$gen")
        Entry(e.value, gen, e.rows - hits(e.value))
      }
    }
    commit(spark, dir,
      State(st.version + 1, st.partitionCol, rewritten, st.props))
    gc(spark, dir)
    hits.values.sum
  }

  /** Footer-only row count of one written generation, read DRIVER-SIDE
    * straight from the parquet footers (no Spark job — the first cut
    * ran `spark.read.parquet(path).count()` per append and the two
    * scheduling round-trips showed up as a measurable slice of the
    * per-micro-batch manifest overhead in the ingest_manifest probe).
    * A generation holds one write's worth of files — dozens, not
    * thousands — so the driver loop is microseconds per file. Also
    * tolerates the all-rows-dropped batch (no parquet file at all). */
  private def countParquet(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val f = p.getFileSystem(conf)
    f.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf))
        try rd.getRecordCount finally rd.close()
      }.sum
  }

  /** Garbage-collect uncommitted debris: `gen-*` directories the
    * manifest doesn't reference (a crashed compact/retract/rebuild/
    * append wrote them but never committed), stale `_MANIFEST.tmp-*`
    * files, and — post-[[adopt]] — leftover `<partitionCol>=N`
    * directories of the pre-adoption layout. This IS the crash
    * recovery: no restore arm exists because no committed data is
    * ever unreferenced. Idempotent; run at ingest start. Returns the
    * number of paths deleted.
    *
    * `minAgeMs` is the concurrent-reader horizon: a reader in ANOTHER
    * process that loaded an older manifest may still be scanning
    * directories this manifest no longer references, so a deployment
    * with concurrent readers defers deletion until debris is older
    * than its longest scan (unreferenced debris is invisible to every
    * NEW reader either way — deferral costs only disk). The
    * single-actor maintenance verbs here use the default 0. */
  def gc(spark: SparkSession, dir: String, minAgeMs: Long = 0L): Int = {
    val f = fs(spark, dir)
    val st = state(spark, dir)
    val live = st.entries.map(_.path).toSet ++ st.props.values
    val cutoff = System.currentTimeMillis() - minAgeMs
    val victims = f.listStatus(new Path(dir)).toSeq.filter { s =>
      val n = s.getPath.getName
      (((n.startsWith("gen-") || n.startsWith("model-")) &&
        !live.contains(n)) ||
        n.startsWith(s"$ManifestFile.tmp-") ||
        (n.startsWith(s"${st.partitionCol}=") && !live.contains(n))) &&
        s.getModificationTime <= cutoff
    }
    victims.foreach(s => f.delete(s.getPath, true))
    victims.size
  }

  /** Adopt an existing `<partitionCol>=N` batch-partitioned artifact
    * (the [[graft.streaming.IngestStream]] layout) into manifest
    * mode, in place: every committed partition becomes a manifest
    * entry POINTING AT ITS EXISTING DIRECTORY — no data is read or
    * moved, adoption is one directory listing plus footer counts and
    * one manifest commit. The old directories lack the partition
    * value as a data column (it lived in the directory name), so
    * [[rows]] would mis-read them — adoption therefore requires an
    * immediate [[compact]], which reads THROUGH the recorded values
    * (see the special-case below) and folds everything into a proper
    * `gen-` base. Call only at a maintenance boundary (no writer, all
    * batches committed). */
  def adopt(spark: SparkSession, dir: String,
      partitionCol: String = "batch",
      maxCommittedValue: Long = Long.MaxValue): Unit = {
    // a STREAMING artifact must be adopted through
    // [[graft.streaming.IngestStream.adoptArtifacts]], which passes
    // the checkpoint's newest commit here: folding a partition whose
    // checkpoint commit is missing into the base would defeat the
    // crash-replay's own-batchId exclusion exactly as compact's guard
    // documents (the replay's docs match their own folded rows and
    // silently vanish). Batch-driven layouts have no mid-batch window
    // and keep the default.
    // Crashed MAINTENANCE must be resolved before adopting: a
    // `.retired-N` / `.old` / `.compacting` sibling holds rows the
    // rename layout's recovery arms would restore, and adoption would
    // silently leave them behind (they live outside `dir`, invisible
    // to both the listing below and gc).
    val f = fs(spark, dir)
    val parent = new Path(dir).getParent
    if (parent != null && f.exists(parent)) {
      val nm = new Path(dir).getName
      val stale = f.listStatus(parent).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith(s"$nm.retired-") ||
          n == s"$nm.old" || n == s"$nm.compacting")
      require(stale.isEmpty,
        s"crashed maintenance sibling(s) ${stale.mkString(", ")} " +
          s"next to $dir — run Artifacts.recoverCompaction/" +
          "recoverRetraction (or restart the ingest query once) " +
          "before adopting")
    }
    // resumable BOTH ways: a crash between the two commits below
    // leaves a manifest whose entries all point at pre-adoption
    // directories (re-run skips to the fold); a crash AFTER the fold
    // commit leaves a completed adoption with stale batch=N debris
    // (re-run just finishes the gc)
    if (exists(spark, dir)) {
      val st = state(spark, dir)
      require(st.partitionCol == partitionCol && st.entries.nonEmpty,
        s"$dir already has a manifest")
      if (st.entries.forall(_.path.startsWith("gen-"))) {
        gc(spark, dir)
        return
      }
      require(st.entries.forall(_.path.startsWith(s"$partitionCol=")),
        s"$dir already has a manifest")
    }
    val resuming = exists(spark, dir)
    val entries = if (resuming) state(spark, dir).entries else {
      val parts = f.listStatus(new Path(dir)).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith(s"$partitionCol="))
        .sortBy(_.stripPrefix(s"$partitionCol=").toLong)
      require(parts.nonEmpty,
        s"nothing to adopt under $dir (no $partitionCol=N directories)")
      val es = parts.map { p =>
        val v = p.stripPrefix(s"$partitionCol=").toLong
        Entry(v, p, countParquet(spark, s"$dir/$p"))
      }
      val bad = es.map(_.value).filter(_ > maxCommittedValue)
      require(bad.isEmpty,
        s"partition value(s) ${bad.mkString(", ")} under $dir have " +
          "no checkpoint commit — the query crashed mid-batch; " +
          "restart it to finish the replay, stop cleanly, then adopt")
      commit(spark, dir, State(1L, partitionCol, es))
      es
    }
    // fold immediately: pre-adoption dirs carry the value in their
    // NAME, not their rows — read them the partition-discovery way
    // and write the one proper base generation
    val n = spark.sessionState.conf.numShufflePartitions
    val gen = s"gen--1-${UUID.randomUUID().toString.take(8)}"
    spark.read.option("basePath", dir)
      .parquet(entries.map(e => s"$dir/${e.path}"): _*)
      .withColumn(partitionCol, lit(-1L))
      .repartition(n)
      .write.mode("overwrite").parquet(s"$dir/$gen")
    val rows = countParquet(spark, s"$dir/$gen")
    commit(spark, dir, State(state(spark, dir).version + 1,
      partitionCol, Seq(Entry(-1L, gen, rows))))
    gc(spark, dir)
    ()
  }
}
