package graft.pipeline

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}

/** Test-only FileSystem that records every rename it is asked to
  * perform — the instrument behind ManifestSpec's rename-less proof:
  * run the whole manifest lifecycle on `audit://` paths, then assert
  * the ONLY renames outside the output committer's `_temporary`
  * internals are single-FILE moves of `_MANIFEST` (the atomic-replace
  * primitive an object PUT provides natively). [[Artifacts]]'s swap
  * discipline run on the same FS shows the contrast: whole-artifact
  * DIRECTORY renames, the primitive object stores lack. */
class RenameAuditFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "audit"
  override def getUri: URI = URI.create("audit:///")
  override def rename(src: Path, dst: Path): Boolean = {
    val isDir =
      try getFileStatus(src).isDirectory
      catch { case _: java.io.IOException => false }
    RenameAuditFileSystem.renames.add(
      (src.toUri.getPath, dst.toUri.getPath, isDir))
    super.rename(src, dst)
  }
}

object RenameAuditFileSystem {
  /** (src path, dst path, src was a directory) for every rename since
    * the last [[reset]]. */
  val renames = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, String, Boolean)]()
  def reset(): Unit = renames.clear()
  def all(): Seq[(String, String, Boolean)] = {
    import scala.jdk.CollectionConverters._
    renames.asScala.toSeq
  }
}

/** The FileContext binding for the `audit` scheme ([[Manifest]]'s
  * commit goes through FileContext for rename-with-overwrite);
  * constructed reflectively by Hadoop from
  * `fs.AbstractFileSystem.audit.impl`. */
class RenameAuditAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new RenameAuditFileSystem, conf,
    "audit", false)
