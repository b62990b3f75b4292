package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming EWMA folds watermark-finalized buckets in event " +
      "order (out-of-order arrivals included) and matches the batch " +
      "twin row for row") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "k", "x")
    val out = EwmaStream.chart(stream, "ts", "k", "x",
      stepSeconds = 60, lambda = 0.5, width = 3.0,
      target = 10.0, sigma = 2.0)
    val q = out.writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    // buckets 0 and 120 arrive BEFORE bucket 60 — the fold must still
    // walk 0, 60, 120 in event order; bucket 0 gets two values (sum)
    mem.addData(
      (t("2024-01-01 00:00:10"), "s", 4.0),
      (t("2024-01-01 00:00:50"), "s", 6.0),
      (t("2024-01-01 00:02:05"), "s", 40.0),
      (t("2024-01-01 00:01:30"), "s", 14.0))
    q.processAllAvailable()
    // sentinels push the watermark forward so earlier buckets finalize
    mem.addData((t("2024-01-01 00:10:00"), "s", 10.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 00:20:00"), "s", 10.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT bucket, x, z, ucl, lcl, alarm FROM ewma_out " +
        "ORDER BY bucket")
      .as[(Timestamp, Double, Double, Double, Double, Long)]
      .collect().toSeq
    q.stop()
    // the first three buckets finalized (the 00:10 sentinel is still
    // within lateness of the moving watermark at stop time or later)
    assert(rows.length >= 3, rows.toString)
    val first3 = rows.take(3)
    assert(first3.map(_._2) == Seq(10.0, 14.0, 40.0)) // bucket sums
    // z walk at λ=.5 from seed 10: 10, 12, 26
    assert(first3.map(_._3) == Seq(10.0, 12.0, 26.0))
    // the last bucket's z escapes the band → alarm
    assert(first3.last._6 == 1L)
    assert(first3.head._6 == 0L)
    // row-for-row parity with the batch twin over the same buckets
    val batchIn = Seq(("s", 0L, 10.0), ("s", 60L, 14.0),
      ("s", 120L, 40.0)).toDF("k", "b", "x")
    val batch = graft.analysis.ChangePoint.ewmaChart(batchIn, Seq("k"),
        "b", "x", lambda = 0.5, width = 3.0, target = Some(10.0),
        sigma = Some(2.0))
      .orderBy("b")
      .select("x", "z", "ucl", "lcl", "alarm")
      .as[(Double, Double, Double, Double, Long)].collect().toSeq
    val streamed = first3.map(r => (r._2, r._3, r._4, r._5, r._6))
    assert(streamed == batch, s"$streamed vs $batch")
  }
}
