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
