package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the pipeline primitive behind "what
  * changed between crawl N and crawl N+1?": per id, classify
  * added / removed / changed / unchanged by comparing a content hash
  * across the two snapshots. Incremental training-data work (delta
  * dedup, re-embedding only changed docs, audit trails for a
  * filtered re-release) starts from exactly this frame.
  *
  * Content identity = md5 over the CONCATENATED PER-COLUMN md5s
  * (nulls marked by a fixed 32-char sentinel no hex digest can equal).
  * Fixed-width pieces make the encoding injection-proof by
  * construction: no character a column VALUE could carry can shift a
  * boundary, a null differs from every literal, and the spelling is
  * plain SQL an oracle replays.
  *
  * Scale shape: ONE full-outer join on the id — the hash collapses
  * each side's content columns map-side, so the join carries
  * (id, 32-byte hash), never the documents; persist both snapshots
  * through [[Curation.writeBucketed]] on the id and the join runs
  * exchange-free (the q143 co-location path).
  */
object Snapshots {

  /** Per-id diff frame: id, `status` in added / removed / changed /
    * unchanged, and the two hashes (null on the absent side). Filter
    * `status != 'unchanged'` for the delta; the full frame is the
    * audit. */
  def snapshotDiff(prev: DataFrame, curr: DataFrame, idCol: String,
      hashCols: Seq[String]): DataFrame = {
    require(hashCols.nonEmpty, "snapshotDiff needs >= 1 content column")
    def hashed(df: DataFrame, out: String) = df.select(
      col(idCol),
      md5(concat(hashCols.map(c =>
        coalesce(md5(col(c).cast("string")), lit("!" * 32))): _*))
        .as(out))
    hashed(prev, "hash_prev")
      .join(hashed(curr, "hash_curr"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("hash_prev").isNull, "added")
          .when(col("hash_curr").isNull, "removed")
          .when(col("hash_prev") === col("hash_curr"), "unchanged")
          .otherwise("changed"))
      .select(col(idCol), col("status"), col("hash_prev"),
        col("hash_curr"))
  }
}
