package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt linear-trend smoothing (double exponential smoothing; Holt
  * 1957) on bucketed series — the capacity-planning forecast an
  * observability dashboard draws past the right edge:
  *
  *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * with the causal seed l_1 = x_1, b_1 = 0 (no peeking at x_2 — the
  * trend warms up through β instead), one-step-ahead fit
  * ŷ_t = l_{t−1} + b_{t−1}, and h-step forecast l_T + h·b_T off any
  * point. A missing bucket value dead-reckons along the trend
  * (l_t = l_{t−1} + b_{t−1}, b_t = b_{t−1}) rather than poisoning
  * the recursion — the [[ChangePoint.cusum]] null convention, advanced
  * by the trend because "no sample" is not "flat".
  *
  * Same scale shape as [[ChangePoint]]: the recursion is inherently
  * sequential per series, so it folds each series' time-sorted bucket
  * array through one codegen'd `aggregate` HOF — one hash shuffle to
  * (series, sorted points), per-series state bounded by the bucket
  * count (never raw event volume), series parallelize freely,
  * posexplode restores rows.
  */
object Forecast {

  /** Holt smoothing per series. Input: one row per (keys, bucket) with
    * a numeric `valueCol`. Output: keys + bucket + value + `level`,
    * `trend`, `fitted` (one-step-ahead ŷ_t, null at t = 1), and
    * `forecast_h` = l_t + horizon·b_t (the h-step-ahead projection
    * from that point; read the last bucket's for the dashboard edge).
    * α, β default to 0.5 — exact binary fractions, so a mirrored
    * recursion in another engine walks bit-identical doubles when the
    * inputs are pre-rounded. */
  def holtLinear(df: DataFrame, keyCols: Seq[String], bucketCol: String,
      valueCol: String, alpha: Double = 0.5, beta: Double = 0.5,
      horizon: Int = 3): DataFrame = {
    require(keyCols.nonEmpty, "holtLinear needs at least one series key")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(beta >= 0.0 && beta <= 1.0, "beta must be in [0, 1]")
    require(horizon >= 1, "horizon must be >= 1")
    val keyCs = keyCols.map(col)
    val grouped = df
      .select(keyCs :+ col(bucketCol).cast("long").as("__b") :+
        col(valueCol).cast("double").as("__x"): _*)
      .groupBy(keyCs: _*)
      .agg(sort_array(collect_list(struct(col("__b"), col("__x"))))
        .as("__pts"))
    // fold state: flat double array [l, b] ++ (level, trend, fitted)
    // per consumed point — flat keeps the whole fold in one codegen'd
    // HOF (the cusum shape). NaN marks the unseeded head and the null
    // fitted at t = 1 (arrays are non-nullable inside aggregate);
    // nanvl-style CASE restores nulls at the end.
    val a = alpha
    val g = beta
    val folded = grouped.withColumn("__st", expr(
      s"""aggregate(__pts,
         |  CAST(array(CAST('NaN' AS DOUBLE), 0.0d) AS ARRAY<DOUBLE>),
         |  (acc, p) -> concat(
         |    CASE
         |      WHEN isnan(acc[0]) AND p.__x IS NULL THEN
         |        array(acc[0], acc[1])
         |      WHEN isnan(acc[0]) THEN array(p.__x, 0.0d)
         |      WHEN p.__x IS NULL THEN
         |        array(acc[0] + acc[1], acc[1])
         |      ELSE array(
         |        $a * p.__x + ${1.0 - a} * (acc[0] + acc[1]),
         |        $g * (($a * p.__x + ${1.0 - a} * (acc[0] + acc[1]))
         |              - acc[0]) + ${1.0 - g} * acc[1])
         |    END,
         |    slice(acc, 3, size(acc) - 2),
         |    CASE
         |      WHEN isnan(acc[0]) AND p.__x IS NULL THEN
         |        array(acc[0], CAST('NaN' AS DOUBLE),
         |          CAST('NaN' AS DOUBLE))
         |      WHEN isnan(acc[0]) THEN
         |        array(p.__x, 0.0d, CAST('NaN' AS DOUBLE))
         |      WHEN p.__x IS NULL THEN
         |        array(acc[0] + acc[1], acc[1], acc[0] + acc[1])
         |      ELSE array(
         |        $a * p.__x + ${1.0 - a} * (acc[0] + acc[1]),
         |        $g * (($a * p.__x + ${1.0 - a} * (acc[0] + acc[1]))
         |              - acc[0]) + ${1.0 - g} * acc[1],
         |        acc[0] + acc[1])
         |    END),
         |  acc -> slice(acc, 3, size(acc) - 2))""".stripMargin))
    val lv = element_at(col("__st"), col("__i") * 3 + 1)
    val tr = element_at(col("__st"), col("__i") * 3 + 2)
    val ft = element_at(col("__st"), col("__i") * 3 + 3)
    def denan(c: org.apache.spark.sql.Column) =
      when(isnan(c), lit(null).cast("double")).otherwise(c)
    folded
      .select(keyCs ++ Seq(col("__st"),
        posexplode(col("__pts")).as(Seq("__i", "__p"))): _*)
      .select(keyCs ++ Seq(
        col("__p.__b").as(bucketCol),
        col("__p.__x").as(valueCol),
        denan(lv).as("level"),
        denan(tr).as("trend"),
        denan(ft).as("fitted"),
        denan(lv + lit(horizon.toDouble) * tr).as("forecast_h")): _*)
  }
}
