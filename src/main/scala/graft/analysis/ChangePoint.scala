package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-point detection on bucketed series — tabular CUSUM (Page
  * 1954; the standard SPC two-sided form): per series, against a target
  * level μ with slack k,
  *
  *   S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k))
  *   S⁻_t = max(0, S⁻_{t−1} + (μ − x_t − k))
  *
  * and a point alarms when either statistic exceeds the threshold h.
  * Detects sustained level shifts that a fixed threshold misses (drift
  * accumulates) while ignoring one-off spikes the slack absorbs — the
  * classic complement to [[Slo]] burn rates and the PromQL anomaly
  * bands for observability alerting.
  *
  * The recursion is inherently sequential per series, so it runs as an
  * expression-only `aggregate` HOF over each series' time-sorted bucket
  * array: one hash shuffle groups the (bucket, value) pairs, the fold
  * carries (S⁺, S⁻, out-array) and posexplode restores rows. Per-series
  * state is bounded by the time range / bucket count (the engine's
  * series contract, same as the PromQL pipelines) — never by raw event
  * volume, which collapsed to one row per (series, bucket) in the
  * upstream aggregation the caller did.
  */
object ChangePoint {

  /** Two-sided CUSUM per series. Input: one row per (series keys,
    * bucket) with a numeric `valueCol`; μ defaults to the series' own
    * mean (self-calibrating — pass `target` to pin it). `slack` and
    * `threshold` are in value units. Output: the input keys + bucket +
    * value + `s_pos`, `s_neg`, `alarm` (1/0), one row per input row.
    *
    * No post-alarm reset: the statistics keep accumulating (the plain
    * Page form; a reset variant changes downstream points only after
    * the first alarm, which monitoring dashboards rarely want). */
  def cusum(df: DataFrame, keyCols: Seq[String], bucketCol: String,
      valueCol: String, slack: Double, threshold: Double,
      target: Option[Double] = None): DataFrame = {
    require(keyCols.nonEmpty, "cusum needs at least one series key")
    val keyCs = keyCols.map(col)
    val grouped = df
      .select(keyCs :+ col(bucketCol).cast("long").as("__b") :+
        col(valueCol).cast("double").as("__x"): _*)
      .groupBy(keyCs: _*)
      .agg(sort_array(collect_list(struct(col("__b"), col("__x"))))
        .as("__pts"),
        avg(col("__x")).as("__mean"))
    val mu = target.map(lit(_).cast("double"))
      .getOrElse(col("__mean"))
    // fold state: [S⁺, S⁻] ++ flattened (sPos, sNeg) per consumed point;
    // a struct-array accumulator would be cleaner but the flat double
    // array keeps the whole fold inside one codegen'd HOF
    val folded = grouped
      .withColumn("__mu", mu)
      .withColumn("__st", expr(
        s"""aggregate(__pts, CAST(array(0.0d, 0.0d) AS ARRAY<DOUBLE>),
           |  (acc, p) -> concat(
           |    array(greatest(0.0d, element_at(acc, 1) +
           |            (p.__x - __mu - $slack)),
           |          greatest(0.0d, element_at(acc, 2) +
           |            (__mu - p.__x - $slack))),
           |    slice(acc, 3, size(acc) - 2),
           |    array(greatest(0.0d, element_at(acc, 1) +
           |            (p.__x - __mu - $slack)),
           |          greatest(0.0d, element_at(acc, 2) +
           |            (__mu - p.__x - $slack)))),
           |  acc -> slice(acc, 3, size(acc) - 2))""".stripMargin))
    folded
      .select(keyCs ++ Seq(col("__st"),
        posexplode(col("__pts")).as(Seq("__i", "__p"))): _*)
      .select(keyCs ++ Seq(
        col("__p.__b").as(bucketCol),
        col("__p.__x").as(valueCol),
        element_at(col("__st"), col("__i") * 2 + 1).as("s_pos"),
        element_at(col("__st"), col("__i") * 2 + 2).as("s_neg")): _*)
      .withColumn("alarm",
        when(col("s_pos") > threshold || col("s_neg") > threshold, 1L)
          .otherwise(0L))
  }

  /** EWMA control chart per series (Roberts 1959; limits per Lucas &
    * Saccucci 1990) — the standard SPC complement to [[cusum]]: where
    * CUSUM accumulates drift against a slack, the EWMA statistic
    *
    *   z_t = λ·x_t + (1 − λ)·z_{t−1},   z_0 = μ₀
    *
    * follows the series with exponentially-fading memory and alarms
    * when it leaves the time-varying control band
    *
    *   μ₀ ± L·σ·sqrt(λ/(2−λ)·(1 − (1−λ)^{2t}))
    *
    * (the band widens toward its asymptote as the statistic's variance
    * warms up — early points get tighter limits, the chart's classic
    * fast-initial-response property).
    *
    * μ₀ defaults to the series' own mean and σ to its population
    * stddev (self-calibrating); pass `target` / `sigma` to pin them,
    * which also makes the chart exactly reproducible across engines
    * (a self-calibrated mean is float-order-dependent). Same scale
    * shape as [[cusum]]: one hash shuffle to (series, sorted bucket
    * array), an expression-only `aggregate` fold (state = the z
    * trajectory, bounded by the series' bucket count), posexplode
    * back to rows. Output: keys + bucket + value + `z`, `ucl`,
    * `lcl`, `alarm` (1/0). */
  def ewmaChart(df: DataFrame, keyCols: Seq[String], bucketCol: String,
      valueCol: String, lambda: Double = 0.25, width: Double = 3.0,
      target: Option[Double] = None, sigma: Option[Double] = None)
      : DataFrame = {
    require(keyCols.nonEmpty, "ewmaChart needs at least one series key")
    require(lambda > 0.0 && lambda <= 1.0, "lambda must be in (0, 1]")
    require(width > 0.0, "width (L) must be positive")
    sigma.foreach(s => require(s > 0.0,
      "an explicit sigma must be positive — a zero-width band alarms " +
        "on every point"))
    val keyCs = keyCols.map(col)
    val grouped = df
      .select(keyCs :+ col(bucketCol).cast("long").as("__b") :+
        col(valueCol).cast("double").as("__x"): _*)
      .groupBy(keyCs: _*)
      .agg(sort_array(collect_list(struct(col("__b"), col("__x"))))
        .as("__pts"),
        avg(col("__x")).as("__mean"),
        stddev_pop(col("__x")).as("__sd"))
    val mu = target.map(lit(_).cast("double")).getOrElse(col("__mean"))
    val sd = sigma.map(lit(_).cast("double")).getOrElse(col("__sd"))
    // fold state: [z_0, z_1, …] — head is the seed μ₀, dropped at finish
    val folded = grouped
      .withColumn("__mu", mu)
      .withColumn("__sd", sd)
      .withColumn("__z", expr(
        // a null sample holds the statistic (z_t = z_{t-1}) instead of
        // poisoning every later z — the [[cusum]] null convention
        s"""aggregate(__pts, array(CAST(__mu AS DOUBLE)),
           |  (acc, p) -> concat(acc,
           |    array($lambda *
           |            coalesce(p.__x, element_at(acc, size(acc))) +
           |          ${1.0 - lambda} * element_at(acc, size(acc)))),
           |  acc -> slice(acc, 2, size(acc) - 1))""".stripMargin))
    val t = (col("__i") + 1).cast("double")
    val halfWidth = lit(width) * col("__sd") *
      sqrt(lit(lambda / (2.0 - lambda)) *
        (lit(1.0) - pow(lit(1.0 - lambda), t * 2)))
    // a self-calibrated sigma of 0 (constant series) or a single-point
    // series has no control-band signal: a zero-width band would alarm
    // on ANY deviation from the mean — a degenerate-series artifact,
    // not a detection. Those series keep their z trajectory but answer
    // null ucl/lcl/alarm (the no-signal spelling); an EXPLICIT sigma
    // is the caller pinning the band, validated positive above.
    val degenerate =
      if (sigma.isDefined) lit(false)
      else col("__sd").isNull || col("__sd") === 0.0 ||
        size(col("__pts")) < 2
    folded
      .withColumn("__deg", degenerate)
      .select(keyCs ++ Seq(col("__mu"), col("__sd"), col("__z"),
        col("__deg"),
        posexplode(col("__pts")).as(Seq("__i", "__p"))): _*)
      .select(keyCs ++ Seq(
        col("__p.__b").as(bucketCol),
        col("__p.__x").as(valueCol),
        element_at(col("__z"), col("__i") + 1).as("z"),
        when(!col("__deg"), col("__mu") + halfWidth).as("ucl"),
        when(!col("__deg"), col("__mu") - halfWidth).as("lcl"),
        col("__deg")): _*)
      .withColumn("alarm",
        when(col("__deg"), lit(null).cast("long"))
          .when(col("z") > col("ucl") || col("z") < col("lcl"), 1L)
          .otherwise(0L))
      .drop("__deg")
  }
}
