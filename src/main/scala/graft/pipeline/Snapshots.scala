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
  * Content identity = md5 over the hash columns joined with the
  * chr(1) separator, nulls marked chr(2) (so a null column and an empty
  * string differ, and "a","b" vs "ab","" differ) — engine-portable,
  * same spelling an oracle replays.
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
      md5(concat_ws("\u0001", hashCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0002"))): _*)).as(out))
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
