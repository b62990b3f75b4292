package graft.compile

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Catalog timestamp normalization: the testdata generator has shipped
  * `events.ts` as TIMESTAMP(NANOS) (→ long via the legacy flag) and as
  * TIMESTAMP(MICROS, NTZ); a raw int64 epoch in any unit must also land
  * on the same (ts timestamp, ts_ns long) pair. */
class CatalogTsSpec extends SparkSpec {
  import spark.implicits._

  private val epochS = 1704067200L // 2024-01-01T00:00:00Z

  private def writeDir(tsValue: Long): String = {
    val dir = Files.createTempDirectory("catalog-ts").toString
    val events = Seq((1L, tsValue, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.parquet(s"$dir/events.parquet")
    for (t <- Catalog.TableNames if t != "events")
      Seq(1).toDF("x").write.parquet(s"$dir/$t.parquet")
    dir
  }

  test("raw int64 epoch normalizes per unit: s, ms, us, ns") {
    val units = Seq(
      "s" -> epochS,
      "ms" -> epochS * 1000L,
      "us" -> epochS * 1000000L,
      "ns" -> epochS * 1000000000L)
    for ((unit, v) <- units) {
      val cat = Catalog.forDir(spark, writeDir(v))
      val row = cat("events").df
        .select(unix_timestamp(col("ts")), col("ts_ns")).head()
      assert(row.getLong(0) == epochS, s"unit=$unit ts")
      assert(row.getLong(1) == epochS * 1000000000L, s"unit=$unit ts_ns")
    }
  }
}
