package graft.compile

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.Streaming

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("csv export writes a single header file readable back") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    dir.deleteOnExit()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Sinks.writeCsv(df, dir.getAbsolutePath)
    val back = spark.read.option("header", "true")
      .csv(dir.getAbsolutePath)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("id", "name"))
  }

  test("json rows payload") {
    val df = Seq((1L, "x")).toDF("id", "v")
    val json = Sinks.toJsonRows(df)
    assert(json == """{"data":[{"id":1,"v":"x"}]}""")
  }

  test("streaming notification sink delivers filtered batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val tail = Streaming.liveTail(mem.toDF().toDF("ts", "msg"),
      "error", implicitColumn = Some("msg"))
    val seen = mutable.Buffer.empty[String]
    val q = Sinks.notifyEachBatch(tail, "notify_test") { rows =>
      seen ++= rows.map(_.getString(1))
    }
    mem.addData(
      (Timestamp.valueOf("2024-01-01 00:00:01"), "error in worker"),
      (Timestamp.valueOf("2024-01-01 00:00:02"), "all fine"))
    q.processAllAvailable()
    q.stop()
    assert(seen.toSeq == Seq("error in worker"))
  }
}
