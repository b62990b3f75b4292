package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CoreFunctions._
import graft.functions.VectorSum

/** Explicit-bounds histogram metric pipelines — Spark re-expression of the
  * reference's CTE chains (packages/common-utils/src/core/histogram.ts).
  *
  * Input frame shape (FIXTURES.md §3 metrics_histogram):
  *   MetricName, ServiceName, TimeUnix, AggregationTemporality,
  *   Count, BucketCounts: Array[Long], ExplicitBounds: Array[Double],
  *   ResourceAttributes/ScopeAttributes/Attributes maps.
  *
  * Scale notes: both pipelines shuffle once on the series key for the window
  * pass (matching the reference storage ORDER BY locality), then once on
  * (bucket, group) with map-side combine (VectorSum aggregator for the
  * bucket-count vectors).
  */
object Histograms {

  private val Bucket = TimeBucketAlias

  private def prepared(df: DataFrame): DataFrame =
    df.withColumn("__series", MetricCompiler.attributesHash(df))
      .withColumn("__bounds_hash", xxhash64(to_json(col("ExplicitBounds"))))

  /** Histogram count: per-(series, bounds, temporality) lag-delta on Count
    * with the histogram reset rule — *take the current count* on reset
    * (current < prev), NOT clamp-to-0 like counters; first cumulative point
    * contributes 0 (reference histogram.ts:89-135 — the rules differ from
    * counter rate deliberately). */
  def count(df: DataFrame, stepSeconds: Long, groupBy: Seq[String] = Nil)
      : DataFrame = {
    val w = Window
      .partitionBy((col("__series") +: col("__bounds_hash") +:
        col("AggregationTemporality") +: groupBy.map(col)): _*)
      .orderBy(col("TimeUnix"))
    prepared(df)
      .withColumn("__cur", col("Count").cast("long"))
      .withColumn("__prev", lag(col("__cur"), 1).over(w))
      .withColumn("delta",
        when(col("AggregationTemporality") === 1, col("__cur"))
          .when(col("AggregationTemporality") === 2 &&
            col("__prev").isNotNull,
            when(col("__cur") < col("__prev"), col("__cur"))
              .otherwise(col("__cur") - col("__prev")))
          .otherwise(lit(0L)))
      .withColumn(Bucket, timeBucket(col("TimeUnix"), stepSeconds))
      .groupBy((col(Bucket) +: groupBy.map(col)): _*)
      .agg(sum(col("delta")).as("count"))
  }

  /** Histogram quantile(level): 3-stage pipeline
    * (reference histogram.ts:137-250):
    *  1. per-series bucket-count array deltas (zeros for first cumulative
    *     point; take-current on temporality=1 / bounds change / reset)
    *  2. sumForEach across series per (bucket, group, bounds)
    *  3. arrayCumSum + linear interpolation at rank = level * total,
    *     with ±inf edge-bucket handling.
    */
  def quantile(df: DataFrame, level: Double, stepSeconds: Long,
      groupBy: Seq[String] = Nil): DataFrame = {
    // -- stage 1: per-series deltas
    val w = Window
      .partitionBy((col("__series") +: groupBy.map(col)): _*)
      .orderBy(col("TimeUnix"))
    val deltas = prepared(df)
      .withColumn("__counts", col("BucketCounts").cast("array<long>"))
      .withColumn("__prev_counts", lag(col("__counts"), 1).over(w))
      .withColumn("__prev_bounds_hash", lag(col("__bounds_hash"), 1).over(w))
      .withColumn("__is_first", col("__prev_counts").isNull)
      .withColumn("__reset",
        exists(zip_with(coalesce(col("__prev_counts"), col("__counts")),
          col("__counts"), (p, c) => c < p), identity))
      .withColumn("deltas",
        when(col("AggregationTemporality") === 2 && col("__is_first"),
          transform(col("__counts"), _ => lit(0L)))
          .when(col("AggregationTemporality") === 1 ||
            col("__bounds_hash") =!= col("__prev_bounds_hash") ||
            col("__reset"), col("__counts"))
          .otherwise(zip_with(col("__counts"), col("__prev_counts"),
            (c, p) => c - p)))
      .withColumn(Bucket, timeBucket(col("TimeUnix"), stepSeconds))

    // -- stage 2: element-wise sum across series
    val gcols = col(Bucket) +: col("MetricName") +: col("ExplicitBounds") +:
      groupBy.map(col)
    val rates = deltas.groupBy(gcols: _*)
      .agg(VectorSum.sumForEach(col("deltas")).as("rates"))

    // -- stage 3: cumsum + interpolation
    val withPoint = rates
      .withColumn("__cum", arrayCumSum(col("rates").cast("array<double>")))
      .withColumn("__n", size(col("__cum")))
      .filter(col("__n") > 1)
      .withColumn("__total", element_at(col("__cum"), -1))
      .filter(col("__total") > 0)
      .withColumn("__rank", lit(level) * col("__total"))
    val interpolated = withPoint
      // first 1-based index with cum > rank (reference arrayFirstIndex x.1 >
      // rank); 0 (no match, level≈1) → clamp to n
      .withColumn("__ui0", array_position(
        transform(col("__cum"), c => c > col("__rank")), true))
      .withColumn("__upper_idx",
        when(col("__ui0") === 0, col("__n")).otherwise(col("__ui0")))
      .withColumn("__upper_count", element_at(col("__cum"), col("__upper_idx").cast("int")))
      // bounds has n-1 entries: the nth zip slot is null → +inf
      .withColumn("__upper_bound",
        when(col("__upper_idx") <= size(col("ExplicitBounds")),
          element_at(col("ExplicitBounds"), col("__upper_idx").cast("int")))
          .otherwise(lit(Double.PositiveInfinity)))
      .withColumn("__lower_bound",
        when(col("__upper_idx") > 1,
          element_at(col("ExplicitBounds"), (col("__upper_idx") - 1).cast("int")))
          .when(col("__upper_bound") > 0, lit(0.0))
          .otherwise(lit(Double.PositiveInfinity)))
      .withColumn("__lower_count",
        when(col("__lower_bound") === 0.0, lit(0.0))
          .when(col("__upper_idx") > 1,
            element_at(col("__cum"), (col("__upper_idx") - 1).cast("int")))
          .otherwise(lit(0.0)))
      .withColumn("value",
        when(col("__upper_bound") === Double.PositiveInfinity,
          element_at(col("ExplicitBounds"), -1))
          .when(col("__lower_bound") === Double.PositiveInfinity,
            element_at(col("ExplicitBounds"), 1))
          .otherwise(col("__lower_bound") +
            (col("__upper_bound") - col("__lower_bound")) *
              when(col("__upper_count") === col("__lower_count"), lit(0.0))
                .otherwise((col("__rank") - col("__lower_count")) /
                  (col("__upper_count") - col("__lower_count")))))
    interpolated.select(
      (col(Bucket) +: col("MetricName") +: groupBy.map(col) :+
        col("value")): _*)
  }
}
