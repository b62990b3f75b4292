package graft.compile

import org.apache.spark.sql.{DataFrame, Row}

/** Result sinks (SURVEY §2.1): CSV export, JSON-rows (the reference's HTTP
  * response shape), and a notification sink that pushes each micro-batch of
  * a streaming alert/tail query to a callback (the webhook boundary —
  * transport is the caller's concern). */
object Sinks {

  /** CSV export like the reference's useCsvExport: single file, header. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** Render `df` (≤ `limit` rows) as a single CSV string with header —
    * the `/export` payload (the reference's useCsvExport surface,
    * app/src/hooks/useCsvExport.tsx). Collects `limit + 1` rows to
    * detect truncation, then formats the kept rows through the SAME
    * Spark CSV writer as [[writeCsv]] (a driver-local LocalRelation
    * write — no re-execution, univocity quoting/escaping, not a
    * hand-rolled formatter), so a file export and an HTTP export are
    * byte-identical. Bounded by `limit` rows of driver memory — the
    * same bound the serving layer's /query collect already accepts;
    * bulk movement stays with the parquet sinks. Returns
    * (csv, truncated). */
  def csvString(df: DataFrame, limit: Int): (String, Boolean) = {
    require(limit >= 0 && limit < Int.MaxValue,
      s"limit must be in [0, ${Int.MaxValue - 1}]: the sentinel fetch " +
        "needs limit + 1")
    val rows = df.limit(limit + 1).collect()
    val truncated = rows.length > limit
    val keep: Array[Row] = if (truncated) rows.take(limit) else rows
    val local = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(keep: _*), df.schema)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-export").toFile
    try {
      val dir = new java.io.File(tmp, "csv")
      writeCsv(local, dir.getAbsolutePath)
      val part = dir.listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".csv"))
        .getOrElse(throw new IllegalStateException(
          s"CSV writer produced no part file in $dir"))
      new String(java.nio.file.Files.readAllBytes(part.toPath),
        java.nio.charset.StandardCharsets.UTF_8) -> truncated
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(tmp)
    }
  }

  /** JSON-rows string payload (ResponseJSON-shaped: data array). */
  def toJsonRows(df: DataFrame, limit: Int = 10000): String =
    df.limit(limit).toJSON.collect()
      .mkString("{\"data\":[", ",", "]}")

  /** Streaming notification sink: invoke `notify` with each micro-batch's
    * rows (webhook/alert fan-out). Returns the started query. */
  def notifyEachBatch(stream: DataFrame, queryName: String)(
      notify: Seq[Row] => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val rows = batch.collect().toSeq
        if (rows.nonEmpty) notify(rows)
      }
      .start()
}
