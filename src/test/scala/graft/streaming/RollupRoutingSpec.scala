package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.compile.MvRouter
import graft.functions.CoreFunctions._
import graft.ir._

/** End-to-end incremental-aggregation path: a streaming rollup
  * (the engine's equivalent of the reference's ClickHouse MVs,
  * 00006_otel_logs_rollups.sql) materializes a pre-aggregate which
  * MvRouter then routes an admissible chart query onto — the streamed
  * partials must compose to exactly the answer a direct scan gives
  * (reference materializedViews.ts:380-465 agg-column mapping). */
class RollupRoutingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private val rows = Seq(
    (t("2024-01-01 00:00:10"), "a", 1.0),
    (t("2024-01-01 00:00:50"), "a", 2.0),
    (t("2024-01-01 00:01:10"), "a", 10.0),
    (t("2024-01-01 00:01:20"), "b", 7.0),
    (t("2024-01-01 00:02:40"), "a", 4.0),
    (t("2024-01-01 00:03:05"), "b", 5.0))

  test("streamed 1m rollup answers a 2m chart query via MvRouter") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "svc", "value")
    val roll = Streaming.rollup(stream, "ts", Some("value"),
      stepSeconds = 60, groupBy = Seq("svc"))
    val q = roll.writeStream.format("memory").queryName("mv_rollup")
      .outputMode("complete").start()
    // two separate micro-batches: partials must merge across batches
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*)
    q.processAllAvailable()
    val mv = spark.table("mv_rollup")
    q.stop()

    val rollup = MvRouter.Rollup(
      df = mv,
      bucketCol = "window_start",
      granularitySeconds = 60,
      dims = Seq("svc"),
      partials = Map("value" -> MvRouter.RollupPartials(
        "cnt", "sum_value", "min_value", "max_value")),
      rowsCol = "cnt")
    val chart = Query(
      select = Seq(
        SelectItem("", Some("n"), Some(AggFn.Count)),
        SelectItem("value", Some("sv"), Some(AggFn.Sum)),
        SelectItem("value", Some("mn"), Some(AggFn.Min)),
        SelectItem("value", Some("mx"), Some(AggFn.Max)),
        SelectItem("value", Some("av"), Some(AggFn.Avg))),
      from = "events",
      groupBy = Seq("svc"),
      granularity = Some(Granularity.Fixed(120)))

    val routed = MvRouter.tryRoute(chart, rollup)
    assert(routed.isDefined, "1m rollup must be admissible for a 2m chart")
    val got = routed.get
      .select(col(TimeBucketAlias), col("svc"), col("n"), col("sv"),
        col("mn"), col("mx"), col("av"))
      .orderBy(TimeBucketAlias, "svc")
      .as[(Timestamp, String, Long, Double, Double, Double, Double)]
      .collect().toSeq

    // direct scan at the chart granularity — the ground truth
    val want = rows.toDF("ts", "svc", "value")
      .groupBy(timeBucket(col("ts"), 120).as("b"), col("svc"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"),
        min("value").as("mn"), max("value").as("mx"),
        avg("value").as("av"))
      .orderBy("b", "svc")
      .as[(Timestamp, String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got == want)
  }

  test("a non-divisible granularity is not routed") {
    val mv = rows.toDF("ts", "svc", "value")
      .groupBy(timeBucket(col("ts"), 60).as("window_start"), col("svc"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"),
        min("value").as("min_value"), max("value").as("max_value"))
    val rollup = MvRouter.Rollup(mv, "window_start", 60, Seq("svc"),
      Map("value" -> MvRouter.RollupPartials(
        "cnt", "sum_value", "min_value", "max_value")), "cnt")
    val chart = Query(
      select = Seq(SelectItem("", Some("n"), Some(AggFn.Count))),
      from = "events",
      granularity = Some(Granularity.Fixed(90)))
    assert(MvRouter.tryRoute(chart, rollup).isEmpty)
  }
}
