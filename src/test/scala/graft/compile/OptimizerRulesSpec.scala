package graft.compile

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ir._

/** SURVEY §4 IR-level optimizer rules: materialized-column substitution and
  * derived partition-date predicates. */
class OptimizerRulesSpec extends SparkSpec {
  import spark.implicits._

  test("materialized column preferred over map descent") {
    val df = Seq(
      ("a", Map("env" -> "prod"), "prod"),
      ("b", Map("env" -> "dev"), "dev"))
      .toDF("id", "attrs", "env_mat")
    val cat = new Catalog(Map("t" -> Source(df,
      materializedColumns = Map("attrs.env" -> "env_mat"))))
    val q = Query(
      select = Seq(SelectItem("id", Some("id"), None)),
      from = "t",
      where = Some(Cond.Lucene("attrs.env:prod")))
    val compiled = QueryCompiler.compile(q, cat)
    assert(compiled.as[String].collect().toSeq == Seq("a"))
    // the predicate must reference the physical column, not
    // element_at(attrs) — check the analyzed plan (the optimizer
    // constant-folds LocalRelations entirely)
    val plan = compiled.queryExecution.analyzed.toString
    assert(plan.contains("env_mat"), plan)
    assert(!plan.toLowerCase.contains("element_at"), plan)
  }

  test("dateRange emits a pruning predicate on the partition column") {
    val dir = Files.createTempDirectory("graft_pp").toFile
    dir.deleteOnExit()
    Catalog.forDir(spark, "/root/testdata/sf0.001")("events").df
      .withColumn("date", to_date(col("ts")))
      .write.partitionBy("date").mode("overwrite")
      .parquet(dir.getAbsolutePath)
    val part = spark.read.parquet(dir.getAbsolutePath)
    val cat = new Catalog(Map("events_p" -> Source(part,
      timestampColumn = Some("ts"),
      partitionDateColumn = Some("date"))))
    val q = Query(
      select = Seq(SelectItem("", Some("cnt"), Some(AggFn.Count))),
      from = "events_p",
      dateRange = Some(QueryCompiler.range(
        "2024-01-10T00:00:00Z", "2024-01-12T23:59:59Z")))
    val compiled = QueryCompiler.compile(q, cat)
    val scan = compiled.queryExecution.executedPlan.collectLeaves().head
    val s = scan.toString
    assert(s.contains("PartitionFilters") && s.contains("date"),
      s.take(400))
    // and the count matches the unpartitioned source
    val expect = Catalog.forDir(spark, "/root/testdata/sf0.001")("events")
      .df.filter(col("ts") >= "2024-01-10" && col("ts") <= "2024-01-12 23:59:59")
      .count()
    assert(compiled.as[Long].head() == expect)
  }
}
