package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CoreFunctions._
import graft.functions.MapSum

/** OTel exponential-histogram pipelines — the Spark re-expression of the
  * reference's hardest compiler pass
  * (packages/common-utils/src/core/histogram.ts:252-661).
  *
  * Input frame (FIXTURES.md §3 metrics_exp_histogram): MetricName,
  * ServiceName, TimeUnix, StartTimeUnix, AggregationTemporality, Scale,
  * Count, ZeroCount, PositiveOffset, PositiveBucketCounts,
  * NegativeOffset, NegativeBucketCounts, attribute maps.
  *
  * Bucket semantics: at scale s, positive bucket index i covers
  * (2^(i·2^-s), 2^((i+1)·2^-s)]; the zero bucket is exactly 0; negative
  * buckets mirror. Mixed-scale series are first normalized down to the
  * minimum scale (wider buckets) by floor-dividing indexes (arithmetic
  * right shift) and summing coalesced buckets.
  */
object ExpHistograms {

  private val Bucket = TimeBucketAlias

  /** shiftright with a Column bit count (the Scala wrapper only accepts a
    * literal Int; the underlying expression is fine with a column).
    * Arithmetic shift = floor division by 2^bits, correct for negative
    * bucket indexes. */
  private def shiftR(a: Column, bits: Column): Column =
    call_function("shiftright", a, bits)

  private def prepared(df: DataFrame): DataFrame =
    df.withColumn("__series", MetricCompiler.attributesHash(df))

  /** Exp-histogram count: lag-delta on Count with the exp-histogram reset
    * rules — first point or StartTimeUnix==TimeUnix → 0; StartTimeUnix
    * changed or count decreased → take current; else diff
    * (reference histogram.ts:279-330). */
  def count(df: DataFrame, stepSeconds: Long, groupBy: Seq[String] = Nil)
      : DataFrame =
    deltaAgg(df, col("Count").cast("long"), lit(0L), "count",
      stepSeconds, groupBy)

  /** Exp-histogram observation sum, same delta/reset machinery as
    * [[count]] but over the Sum field. Resets are still DETECTED on
    * Count (the canonical monotone signal — Sum itself may legitimately
    * decrease under negative observations). */
  def sumOf(df: DataFrame, stepSeconds: Long, groupBy: Seq[String] = Nil)
      : DataFrame =
    deltaAgg(df, col("Sum").cast("double"), lit(0.0), "sum",
      stepSeconds, groupBy)

  /** Shared lag-delta with exp-histogram reset rules: `value` is what is
    * accumulated (`zero` its typed zero); resets detect on Count. */
  private def deltaAgg(df: DataFrame, value: Column, zero: Column,
      outCol: String, stepSeconds: Long, groupBy: Seq[String])
      : DataFrame = {
    val w = Window
      .partitionBy((col("MetricName") +: col("__series") +:
        col("AggregationTemporality") +: groupBy.map(col)): _*)
      .orderBy(col("TimeUnix"))
    prepared(df)
      .withColumn("__cur", value)
      .withColumn("__det", col("Count").cast("long"))
      .withColumn("__prev", lag(col("__cur"), 1).over(w))
      .withColumn("__prev_det", lag(col("__det"), 1).over(w))
      .withColumn("__prev_start", lag(col("StartTimeUnix"), 1).over(w))
      .withColumn("delta",
        when(col("AggregationTemporality") === 1, col("__cur"))
          .when(col("AggregationTemporality") === 2,
            when(col("__prev").isNull ||
              col("StartTimeUnix") === col("TimeUnix"), zero)
              .when(col("StartTimeUnix") =!= col("__prev_start") ||
                col("__det") < col("__prev_det"), col("__cur"))
              .otherwise(col("__cur") - col("__prev")))
          .otherwise(zero))
      .withColumn(Bucket, timeBucket(col("TimeUnix"), stepSeconds))
      .groupBy((col(Bucket) +: groupBy.map(col)): _*)
      .agg(sum(col("delta")).as(outCol))
  }

  // ---------------------------------------------------------------- util

  /** Downscale a bucket-count array from its own scale to the normalized
    * scale: normalized index nb sums all original buckets whose
    * floor(index / 2^shift) == nb (equivalent to the reference's
    * arraySplit-at-divisible-index + arraySum, histogram.ts:368-424).
    * One codegen'd O(B) pass — see [[graft.functions.DownscaleBuckets]];
    * the previous higher-order-function form was O(B²) per row in
    * interpreted lambdas and dominated the quantile pipelines. */
  private def downscaled(counts: Column, offset: Column,
      shift: Column): Column =
    graft.functions.BucketOps.downscaleBuckets(counts, offset, shift)

  /** `arrayResize(arrayConcat(zeros(pad), arraySlice(prev, 1+drop)), n)`:
    * align the previous window's counts to the current index window
    * (reference histogram.ts:510-540). */
  private def aligned(prev: Column, prevOff: Column, curOff: Column,
      n: Column): Column = {
    val pad = greatest(lit(0L), prevOff - curOff).cast("int")
    val drop = greatest(lit(0L), curOff - prevOff).cast("int")
    val shifted = concat(
      array_repeat(lit(0L), pad),
      slice(coalesce(prev, array().cast("array<long>")), drop + 1,
        greatest(size(coalesce(prev, array().cast("array<long>"))) - drop,
          lit(0))))
    // resize to n: pad with zeros then truncate
    slice(concat(shifted, array_repeat(lit(0L), n.cast("int"))), lit(1),
      n.cast("int"))
  }

  private def emptyLongArray: Column = array().cast("array<long>")

  // ------------------------------------------------------------- quantile

  /** Stages shared by [[quantile]] and [[fraction]]: scale normalization
    * → cumulative→delta conversion with offset alignment → sumMap merge
    * across series (reference histogram.ts:334-540). Output: one row per
    * (time bucket, groupBy…) with the merged sparse buckets — `Scale`,
    * `zero_count`, `pos_map`/`neg_map` (bucket index → count). */
  private def mergedBuckets(df: DataFrame, stepSeconds: Long,
      groupBy: Seq[String]): DataFrame = {
    val src = prepared(df)

    // ---- stage 1: normalize all series to the minimum scale
    val minScale = src.agg(min(col("Scale")).as("__norm_scale"))
    val normalized = src.crossJoin(broadcast(minScale))
      .withColumn("__shift", col("Scale") - col("__norm_scale"))
      .withColumn("PositiveBucketCounts",
        downscaled(col("PositiveBucketCounts").cast("array<long>"),
          col("PositiveOffset").cast("long"), col("__shift")))
      .withColumn("NegativeBucketCounts",
        downscaled(col("NegativeBucketCounts").cast("array<long>"),
          col("NegativeOffset").cast("long"), col("__shift")))
      .withColumn("PositiveOffset",
        shiftR(col("PositiveOffset").cast("long"), col("__shift")))
      .withColumn("NegativeOffset",
        shiftR(col("NegativeOffset").cast("long"), col("__shift")))
      .withColumn("Scale", col("__norm_scale"))
      // barrier: materialize the downscaled arrays before the window pass
      .repartition(col("__series"))

    // ---- stage 2a: cumulative branch → deltas
    val w = Window
      .partitionBy((col("MetricName") +: col("__series") +:
        groupBy.map(col)): _*)
      .orderBy(col("TimeUnix"))
    val cumulative = normalized
      .filter(col("AggregationTemporality") === 2)
      .withColumn("__zc", col("ZeroCount").cast("long"))
      .withColumn("__prev_zc", lag(col("__zc"), 1).over(w))
      .withColumn("__prev_start", lag(col("StartTimeUnix"), 1).over(w))
      .withColumn("__prev_poff", lag(col("PositiveOffset"), 1).over(w))
      .withColumn("__prev_noff", lag(col("NegativeOffset"), 1).over(w))
      .withColumn("__prev_pc", lag(col("PositiveBucketCounts"), 1).over(w))
      .withColumn("__prev_nc", lag(col("NegativeBucketCounts"), 1).over(w))
      .withColumn("__aligned_pc", aligned(col("__prev_pc"),
        col("__prev_poff"), col("PositiveOffset"),
        size(col("PositiveBucketCounts"))))
      .withColumn("__aligned_nc", aligned(col("__prev_nc"),
        col("__prev_noff"), col("NegativeOffset"),
        size(col("NegativeBucketCounts"))))
      .withColumn("__pdeltas", zip_with(col("PositiveBucketCounts"),
        col("__aligned_pc"), (c, p) => c - p))
      .withColumn("__ndeltas", zip_with(col("NegativeBucketCounts"),
        col("__aligned_nc"), (c, p) => c - p))
      .withColumn("__p_dec",
        coalesce(array_min(col("__pdeltas")) < 0, lit(false)) ||
          aggregate(coalesce(col("__prev_pc"), emptyLongArray), lit(0L),
            _ + _) >
          aggregate(col("__aligned_pc"), lit(0L), _ + _))
      .withColumn("__n_dec",
        coalesce(array_min(col("__ndeltas")) < 0, lit(false)) ||
          aggregate(coalesce(col("__prev_nc"), emptyLongArray), lit(0L),
            _ + _) >
          aggregate(col("__aligned_nc"), lit(0L), _ + _))
      .withColumn("__use_zero",
        col("__prev_zc").isNull ||
          col("StartTimeUnix") === col("TimeUnix"))
      .withColumn("__use_current",
        !col("__use_zero") && (
          col("StartTimeUnix") =!= col("__prev_start") ||
            col("__zc") < col("__prev_zc") ||
            col("__p_dec") || col("__n_dec")))
      .select(
        (col("MetricName") +: col("TimeUnix") +: col("Scale") +:
          groupBy.map(col) :+
          when(col("__use_zero"), lit(0L))
            .when(col("__use_current"), col("__zc"))
            .otherwise(col("__zc") - col("__prev_zc")).as("zero_count") :+
          when(col("__use_zero") ||
            size(col("PositiveBucketCounts")) === 0, emptyLongArray)
            .otherwise(sequence(col("PositiveOffset"),
              col("PositiveOffset") + size(col("PositiveBucketCounts")) - 1))
            .as("pos_idx") :+
          when(col("__use_zero"), emptyLongArray)
            .when(col("__use_current"), col("PositiveBucketCounts"))
            .otherwise(col("__pdeltas")).as("pos_cnt") :+
          when(col("__use_zero") ||
            size(col("NegativeBucketCounts")) === 0, emptyLongArray)
            .otherwise(sequence(col("NegativeOffset"),
              col("NegativeOffset") + size(col("NegativeBucketCounts")) - 1))
            .as("neg_idx") :+
          when(col("__use_zero"), emptyLongArray)
            .when(col("__use_current"), col("NegativeBucketCounts"))
            .otherwise(col("__ndeltas")).as("neg_cnt")): _*)

    // ---- stage 2b: delta branch passes through
    val deltaBranch = normalized
      .filter(col("AggregationTemporality") === 1)
      .select(
        (col("MetricName") +: col("TimeUnix") +: col("Scale") +:
          groupBy.map(col) :+
          col("ZeroCount").cast("long").as("zero_count") :+
          when(size(col("PositiveBucketCounts")) === 0, emptyLongArray)
            .otherwise(sequence(col("PositiveOffset"),
              col("PositiveOffset") + size(col("PositiveBucketCounts")) - 1))
            .as("pos_idx") :+
          col("PositiveBucketCounts").as("pos_cnt") :+
          when(size(col("NegativeBucketCounts")) === 0, emptyLongArray)
            .otherwise(sequence(col("NegativeOffset"),
              col("NegativeOffset") + size(col("NegativeBucketCounts")) - 1))
            .as("neg_idx") :+
          col("NegativeBucketCounts").as("neg_cnt")): _*)

    val deltas = cumulative.unionByName(deltaBranch)
      .withColumn(Bucket, timeBucket(col("TimeUnix"), stepSeconds))

    // ---- stage 3: merge across series (sumMap on sparse indexes)
    val gcols = col(Bucket) +: groupBy.map(col)
    deltas
      .withColumn("__pmap", map_from_arrays(col("pos_idx"), col("pos_cnt")))
      .withColumn("__nmap", map_from_arrays(col("neg_idx"), col("neg_cnt")))
      .groupBy(gcols: _*)
      .agg(
        first(col("Scale")).as("Scale"),
        sum(col("zero_count")).as("zero_count"),
        MapSum.sumMap(col("__pmap")).as("pos_map"),
        MapSum.sumMap(col("__nmap")).as("neg_map"))
  }

  /** Exp-histogram quantile(level): [[mergedBuckets]] → ordered
    * negative|zero|positive concat → rank selection → log-linear
    * interpolation (reference histogram.ts:334-661). */
  def quantile(df: DataFrame, level: Double, stepSeconds: Long,
      groupBy: Seq[String] = Nil): DataFrame = {
    val summed = mergedBuckets(df, stepSeconds, groupBy)
    val gcols = col(Bucket) +: groupBy.map(col)

    // ---- stage 4: ordered neg|zero|pos arrays, rank selection
    def sortedKeys(m: Column): Column = sort_array(map_keys(m))
    def valuesFor(m: Column, keys: Column): Column =
      transform(keys, k => element_at(m, k))
    val arranged = summed
      .withColumn("__pkeys", sortedKeys(col("pos_map")))
      .withColumn("__nkeys", sortedKeys(col("neg_map")))
      .withColumn("bucket_indexes", concat(
        reverse(col("__nkeys")), array(lit(0L)), col("__pkeys")))
      .withColumn("bucket_counts", concat(
        reverse(valuesFor(col("neg_map"), col("__nkeys"))),
        array(col("zero_count")),
        valuesFor(col("pos_map"), col("__pkeys"))))
      .withColumn("neg_n", size(col("__nkeys")))
      .withColumn("__cum",
        arrayCumSum(col("bucket_counts").cast("array<double>")))
      .withColumn("total", element_at(col("__cum"), -1))
      .filter(col("total") > 0)
      .withColumn("rank", lit(level) * col("total"))
      // first non-empty bucket whose cumulative count reaches the rank
      .withColumn("sel_pos", array_position(
        zip_with(col("__cum"), col("bucket_counts").cast("array<double>"),
          (c, b) => b > 0 && c >= col("rank")), true))
      .filter(col("sel_pos") > 0)
      .withColumn("side",
        signum(col("sel_pos") - col("neg_n") - 1))
      .withColumn("sel_idx",
        element_at(col("bucket_indexes"), col("sel_pos").cast("int")))
      .withColumn("frac",
        (col("rank") - when(col("sel_pos") === 1, lit(0.0))
          .otherwise(element_at(col("__cum"),
            (col("sel_pos") - 1).cast("int")))) /
          element_at(col("bucket_counts").cast("array<double>"),
            col("sel_pos").cast("int")))

    // ---- stage 5: log-linear interpolation within the selected bucket
    val width = pow(lit(2.0), -col("Scale")) // 2^-scale
    arranged
      .withColumn("value",
        when(col("side") < 0,
          -pow(lit(2.0), (col("sel_idx") + 1 - col("frac")) * width))
          .when(col("side") > 0,
            pow(lit(2.0), (col("sel_idx") + col("frac")) * width))
          .otherwise(lit(0.0)))
      .select((gcols :+ col("value")): _*)
  }

  /** Exp-histogram fraction of observations in (lower, upper] — the
    * native-histogram SLO accessor (promql histogram_fraction,
    * functions.go HistogramFraction): estimated-CDF difference
    * `(F(upper) − F(lower)) / total` where F(x) = estimated count ≤ x,
    * with the same log-linear within-bucket interpolation as [[quantile]]
    * (its exact inverse, so `fraction(-Inf, quantile(φ)) = φ` on the same
    * frame). Bounds that land on bucket boundaries are exact — no
    * interpolation error; the interval is half-open (lower, upper] the
    * way bucket boundaries themselves are.
    *
    * Conventions: the zero bucket counts as exactly 0, so it is included
    * iff lower < 0 ≤ upper; empty step → no row (quantile drops them
    * too); a degenerate upper < lower clamps to 0. */
  def fraction(df: DataFrame, lower: Double, upper: Double,
      stepSeconds: Long, groupBy: Seq[String] = Nil): DataFrame = {
    val gcols = col(Bucket) +: groupBy.map(col)
    val width = pow(lit(2.0), -col("Scale")) // 2^-scale

    def mapTotal(m: Column): Column =
      aggregate(map_values(m), lit(0L), _ + _).cast("double")
    def clamp01(c: Column): Column =
      least(greatest(c, lit(0.0)), lit(1.0))
    // estimated count of observations ≤ x (x a literal bound)
    def cdf(x: Double): Column =
      if (x.isPosInfinity)
        mapTotal(col("neg_map")) + col("zero_count") +
          mapTotal(col("pos_map"))
      else if (x.isNegInfinity) lit(0.0)
      else if (x >= 0) {
        // positive bucket i covers (2^(i·w), 2^((i+1)·w)]: portion ≤ x is
        // clamp01(log2(x)/w − i); log2(0) = −Inf → 0, so x = 0 degrades
        // to negatives + zero bucket exactly
        val l2 = lit(math.log(x) / math.log(2.0))
        mapTotal(col("neg_map")) + col("zero_count") +
          aggregate(map_entries(col("pos_map")), lit(0.0), (acc, e) =>
            acc + e.getField("value") *
              clamp01(l2 / width - e.getField("key")))
      } else {
        // negative bucket j covers [−2^((j+1)·w), −2^(j·w)): portion ≤ x
        // is clamp01((j+1) − log2(−x)/w)
        val l2 = lit(math.log(-x) / math.log(2.0))
        aggregate(map_entries(col("neg_map")), lit(0.0), (acc, e) =>
          acc + e.getField("value") *
            clamp01(e.getField("key") + 1 - l2 / width))
      }

    mergedBuckets(df, stepSeconds, groupBy)
      .withColumn("__total", mapTotal(col("neg_map")) +
        col("zero_count") + mapTotal(col("pos_map")))
      .filter(col("__total") > 0)
      .withColumn("value",
        greatest(cdf(upper) - cdf(lower), lit(0.0)) / col("__total"))
      .select((gcols :+ col("value")): _*)
  }

  /** Native-histogram spread (Prometheus `histogram_stddev` /
    * `histogram_stdvar`, promql functions.go funcHistogramStdDev): each
    * merged bucket contributes its count at the bucket's GEOMETRIC
    * midpoint √(lower·upper) = 2^((i+0.5)·2^−s) (negated on the negative
    * side; the zero bucket sits at 0 — it straddles the origin), the mean
    * is the true Sum/Count ratio from the same delta/reset machinery as
    * [[sumOf]]/[[count]], and variance = Σ cntᵇ·(midᵇ − mean)² / total.
    * Buckets per row are tiny (≤ dozens) so the interpreted array lambdas
    * are off the per-row hot path — same budget call as [[fraction]]. */
  def spread(df: DataFrame, stepSeconds: Long,
      groupBy: Seq[String] = Nil, variance: Boolean = false): DataFrame = {
    val keys = Bucket +: groupBy
    val base = mergedBuckets(df, stepSeconds, groupBy)
      .join(count(df, stepSeconds, groupBy), keys)
      .join(sumOf(df, stepSeconds, groupBy), keys)
    val width = pow(lit(2.0), -col("Scale")) // 2^-scale
    def mid(k: Column): Column =
      pow(lit(2.0), (k.cast("double") + lit(0.5)) * width)
    val mean = col("sum") / col("count").cast("double")
    def side(m: Column, sign: Double): Column =
      aggregate(map_entries(m), lit(0.0), (acc, e) =>
        acc + e.getField("value").cast("double") *
          pow(lit(sign) * mid(e.getField("key")) - mean, 2))
    val total = aggregate(map_values(col("pos_map")), lit(0L), _ + _) +
      aggregate(map_values(col("neg_map")), lit(0L), _ + _) +
      col("zero_count")
    val varCol = (side(col("pos_map"), 1.0) + side(col("neg_map"), -1.0) +
      col("zero_count").cast("double") * mean * mean) /
      total.cast("double")
    base.filter(total > 0)
      .withColumn("value", if (variance) varCol else sqrt(varCol))
      .select((col(Bucket) +: groupBy.map(col) :+ col("value")): _*)
  }
}
