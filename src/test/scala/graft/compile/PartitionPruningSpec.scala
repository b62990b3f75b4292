package graft.compile

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The storage-layout story at scale (SURVEY §4): the reference's tables
  * are partitioned by day (`PARTITION BY toDate(Timestamp)`); in Spark the
  * equivalent is a date-partitioned parquet layout, and a date-derived
  * predicate prunes files before any IO. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned layout + date predicate prunes partitions") {
    val dir = Files.createTempDirectory("graft_part").toFile
    dir.deleteOnExit()
    val events = Catalog.forDir(spark, "/root/testdata/sf0.001")("events").df
    // writer side: the layout our sinks produce for log-shaped data
    events.withColumn("date", to_date(col("ts")))
      .write.partitionBy("date").mode("overwrite")
      .parquet(dir.getAbsolutePath)

    val back = spark.read.parquet(dir.getAbsolutePath)
    val filtered = back.filter(
      col("date") >= lit("2024-01-10") && col("date") <= lit("2024-01-12"))
    // partition pruning is visible in the scan's partition filters
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.contains("date"), scanStr.take(400))
    // and the row count matches a 3-day slice
    val expected = events.filter(
      to_date(col("ts")).between("2024-01-10", "2024-01-12")).count()
    assert(filtered.count() == expected)
    assert(expected > 0)
  }

  test("filters push down and projection prunes the parquet ReadSchema") {
    val events = Catalog.forDir(spark, "/root/testdata/sf0.001")("events").df
    val q = events.filter(col("user_id") === 7)
      .select("user_id", "value")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // predicate reaches the scan even through the Catalog's ts projection
    assert(scan.contains("PushedFilters") && scan.contains("user_id"),
      scan.take(500))
    // only the two referenced columns are read — ts_ns/props are pruned
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("props"), scan.take(500))
  }
}
