package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance operators for the batch-partitioned parquet artifacts
  * the continuous-ingest lifecycle accretes — the
  * [[Dedup.signatureStore]] / kept-docs / IVF-PQ-index directories that
  * [[graft.streaming.IngestStream]] grows by one `batch=N` partition
  * per micro-batch (the reference's observability store is immutable
  * and has no analogue; a 100-TB curation pipeline needs both of
  * these on day one):
  *
  *  - [[compactPartitioned]] coalesces every committed partition into
  *    one new base generation. At minute-level batches the layout is
  *    thousands of directories per week, and every store read pays
  *    their file-listing plus one tiny-file task each — measured in
  *    the `ingest_store` StreamLoadProbe as per-batch wall drifting
  *    2.06→2.44 s over just 40 batches.
  *  - [[retractPartitioned]] removes a set of ids (late
  *    decontamination hits, takedowns) by rewriting ONLY the
  *    partitions that contain them — the id list is takedown-sized,
  *    so it broadcasts, and untouched partitions (the overwhelming
  *    majority at 100 TB) keep their files byte-identical.
  *
  * Both operate on a STOPPED artifact (no concurrent writer — stop the
  * ingest query first; [[graft.streaming.IngestStream]]'s checkpoint
  * carries only source offsets, so stop → maintain → restart is safe
  * by its restart contract). Directory swaps go through rename, the
  * cheapest atomic primitive a filesystem offers; every crash window
  * leaves a completed copy of the data under a documented name (see
  * each method). On an object store without atomic rename (where a
  * real 100-TB corpus lives), use the [[Manifest]] layout instead —
  * the same verbs committed by a single-object manifest replace, no
  * directory rename anywhere (ManifestSpec proves it on a
  * rename-auditing FileSystem); [[Manifest.adopt]] migrates this
  * layout in place. The row-level semantics are identical.
  */
object Artifacts {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read a batch-partitioned artifact without its partition column —
    * the logical row set every maintenance op preserves. */
  private def rows(spark: SparkSession, dir: String,
      partitionCol: String): DataFrame =
    spark.read.option("basePath", dir).parquet(dir).drop(partitionCol)

  /** Coalesce every `partitionCol=N` partition under `dir` into a
    * single new base generation `partitionCol=<baseValue>` — the
    * logical row multiset is unchanged (any id-disjoint union of the
    * same rows is equivalent to the consumers: band joins, ANN cell
    * scans, and keep/drop decisions are all row-set functions).
    *
    * `repartitionCols` co-locates rows for the artifact's read path
    * (e.g. the IVF-PQ index by `cell`, the unit its queries scan);
    * empty → size-shaped round-robin files. `numFiles` bounds the
    * output file count (0 → the session's shuffle parallelism; at
    * 100 TB pass bytes/128 MB).
    *
    * Swap discipline: the new base is fully written to
    * `<dir>.compacting` first, then `<dir>` → `<dir>.old`,
    * `<dir>.compacting` → `<dir>`, delete `<dir>.old`. Crash recovery
    * is mechanical: `<dir>` present → nothing to do (re-run compaction
    * if `.compacting` is a stale leftover — it is deleted and
    * restarted here); `<dir>` missing with `<dir>.old` present →
    * rename `.old` back (the compacted copy in `.compacting`, if
    * complete, may be swapped in instead). Never run with a live
    * writer on `dir`. */
  def compactPartitioned(spark: SparkSession, dir: String,
      partitionCol: String = "batch", baseValue: Long = -1L,
      repartitionCols: Seq[String] = Nil, numFiles: Int = 0): Unit = {
    swapInto(spark, dir) { tmp =>
      val data = rows(spark, dir, partitionCol)
      // file count sized by artifact bytes (Sizing.writeWidth) unless
      // the caller pinned one — a constant here wrote
      // numShufflePartitions KB-files for small stores
      val n = if (numFiles > 0) numFiles else Sizing.writeWidth(data)
      val shaped =
        if (repartitionCols.nonEmpty)
          data.repartition(n, repartitionCols.map(col): _*)
        else data.repartition(n)
      // one shuffle-write of the full artifact — the read side still
      // has the old directory in place (the plan is lazy; this is the
      // action)
      shaped.write.mode("overwrite")
        .parquet(new Path(tmp, s"$partitionCol=$baseValue").toString)
    }
  }

  /** The shared swap discipline: `write` fills `<dir>.compacting`,
    * then `<dir>` → `<dir>.old`, `.compacting` → `<dir>`, delete
    * `.old`. Every crash window leaves the original complete under a
    * name [[recoverCompaction]] resolves (it is agnostic to WHAT was
    * being staged — compaction and rebuild share the siblings). */
  private[pipeline] def swapInto(spark: SparkSession, dir: String)(
      write: String => Unit): Unit = {
    val f = fs(spark, dir)
    val dirP = new Path(dir)
    require(f.exists(dirP), s"swapInto: $dir does not exist" +
      s" — if ${dir}.old exists, a prior swap crashed between " +
      "renames; run recoverCompaction first")
    val tmp = new Path(dir + ".compacting")
    val old = new Path(dir + ".old")
    f.delete(tmp, true) // stale leftover of a crashed prior attempt
    f.delete(old, true)
    write(tmp.toString)
    require(f.rename(dirP, old), s"rename $dir -> $old failed")
    require(f.rename(tmp, dirP), s"rename $tmp -> $dir failed " +
      s"(data is intact at $old)")
    f.delete(old, true)
  }

  /** Mechanical recovery for a [[compactPartitioned]] crash, resolving
    * the documented windows conservatively — the ORIGINAL data always
    * wins (the compacted copy has no completeness witness without a
    * manifest, so it is never trusted over the original):
    *
    *  - `dir` present: any `.compacting` / `.old` siblings are stale
    *    leftovers (the prior attempt either completed its swap or
    *    failed before the first rename) — delete them.
    *  - `dir` missing, `<dir>.old` present: the crash hit between the
    *    two renames — rename `.old` back and delete `.compacting`.
    *
    * Returns true if `dir` is usable afterwards. Idempotent; call at
    * ingest-restart time before reading the artifact. */
  def recoverCompaction(spark: SparkSession, dir: String): Boolean = {
    val f = fs(spark, dir)
    val dirP = new Path(dir)
    val tmp = new Path(dir + ".compacting")
    val old = new Path(dir + ".old")
    if (f.exists(dirP)) {
      f.delete(tmp, true)
      f.delete(old, true)
      true
    } else if (f.exists(old)) {
      require(f.rename(old, dirP), s"rename $old -> $dir failed")
      f.delete(tmp, true)
      true
    } else false
  }

  /** The commit witness [[retractPartitioned]] writes itself (one
    * empty file, created AFTER the survivor rewrite returns). The
    * parquet committer's `_SUCCESS` is not used: clusters commonly
    * disable it (`mapreduce.fileoutputcommitter.marksuccessfuljobs=
    * false`, the object-store default in several distros), and under
    * that setting a fully committed rewrite would be indistinguishable
    * from a partial one — recovery would silently restore the retired
    * sibling and un-retract the documents. A marker this code owns
    * cannot be configured away. */
  private[pipeline] val RetractCommitted = "_RETRACT_COMMITTED"

  /** Mechanical recovery for a [[retractPartitioned]] crash: for each
    * `<dir>.retired-N` sibling, if the rewritten partition COMMITTED
    * (present with a commit witness — see below) the sibling is a
    * stale leftover of a completed rewrite — delete it; otherwise the
    * crash hit between the rename and the witness — delete the
    * partial partition and restore the sibling, so no survivor row is
    * ever lost (a rewrite that completed but missed its witness is
    * merely redone when the operator re-runs the crashed retraction).
    *
    * Two witnesses are accepted: the explicit [[RetractCommitted]]
    * marker (the primary — this code writes it itself, so no
    * configuration can suppress it), and the committer's `_SUCCESS`.
    * `_SUCCESS` is trustworthy when PRESENT — the rename moved the
    * original partition (and its original `_SUCCESS`) aside, so a
    * `_SUCCESS` inside a post-rename partition can only have been
    * written by the rewrite job's own commit — it just cannot be
    * REQUIRED, because `marksuccessfuljobs=false` deployments never
    * write one. Accepting it keeps upgrade recovery lossless: a
    * sibling left by a pre-marker-era crash whose rewrite fully
    * committed (has `_SUCCESS`, predates [[RetractCommitted]]) is
    * resolved as committed instead of being restored — which would
    * silently un-retract those documents (round-17 advice).
    *
    * Returns the number of siblings resolved. Idempotent; runs
    * automatically at the top of every [[retractPartitioned]] and at
    * ingest start. */
  def recoverRetraction(spark: SparkSession, dir: String,
      partitionCol: String = "batch"): Int = {
    val f = fs(spark, dir)
    val dirP = new Path(dir)
    val parent = dirP.getParent
    if (parent == null || !f.exists(parent)) return 0
    val prefix = dirP.getName + ".retired-"
    val siblings = f.listStatus(parent).toSeq
      .filter(_.getPath.getName.startsWith(prefix))
    siblings.foreach { s =>
      val b = s.getPath.getName.stripPrefix(prefix)
      val part = new Path(dir, s"$partitionCol=$b")
      if (f.exists(part) &&
        (f.exists(new Path(part, RetractCommitted)) ||
          f.exists(new Path(part, "_SUCCESS"))))
        f.delete(s.getPath, true)
      else {
        f.delete(part, true)
        require(f.rename(s.getPath, part),
          s"rename ${s.getPath} -> $part failed")
      }
    }
    siblings.size
  }

  /** Remove every row whose `idCol` is in `ids` by rewriting only the
    * partitions that CONTAIN a retracted id. One broadcast semi-join
    * pass finds the hit partitions (ids are takedown-sized — list,
    * not corpus); each hit partition is rewritten through a
    * rename-first swap; untouched partitions keep their files
    * byte-identical. Returns the number of rows removed.
    *
    * Per-partition swap discipline: `partitionCol=N` → the SIBLING
    * `<dir>.retired-N` (outside `dir`, so partition discovery of the
    * artifact never sees it), write the anti-joined survivors back as
    * `partitionCol=N`, then create the [[RetractCommitted]] marker
    * inside it (the commit witness this code owns — see its doc for
    * why the committer's `_SUCCESS` is not trusted), delete the
    * sibling. Every crash window is resolved by
    * [[recoverRetraction]], which also runs at the top of this method
    * — a crashed prior retraction is repaired before the hit scan, so
    * its rows are visible to this one. Never run with a live writer
    * on `dir`. */
  def retractPartitioned(spark: SparkSession, dir: String,
      ids: DataFrame, idCol: String,
      partitionCol: String = "batch"): Long = {
    import spark.implicits._
    recoverRetraction(spark, dir, partitionCol)
    val f = fs(spark, dir)
    val idsB = broadcast(ids.select(col(idCol)).distinct())
    // one partition-discovered, column-pruned pass: which partitions
    // hold retracted ids, and how many rows go (partition discovery
    // infers small batch ids as INT — cast pins the collect type)
    val hits = spark.read.option("basePath", dir).parquet(dir)
      .join(idsB, Seq(idCol), "left_semi")
      .groupBy(col(partitionCol).cast("long").as("__b"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    hits.foreach { case (b, _) =>
      val part = new Path(dir, s"$partitionCol=$b")
      val retired = new Path(dir + s".retired-$b")
      // recoverRetraction above resolved any leftover sibling; one
      // existing here would mean a concurrent writer (forbidden)
      require(!f.exists(retired),
        s"$retired exists mid-run — concurrent retraction?")
      require(f.rename(part, retired),
        s"rename $part -> $retired failed")
      spark.read.parquet(retired.toString)
        .join(idsB, Seq(idCol), "left_anti")
        .write.mode("overwrite").parquet(part.toString)
      f.create(new Path(part, RetractCommitted)).close()
      f.delete(retired, true)
    }
    hits.map(_._2).sum
  }
}
