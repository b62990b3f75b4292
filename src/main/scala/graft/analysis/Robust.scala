package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Median/MAD robust outlier detection on bucketed series — the
  * Hampel identifier (Hampel 1974; the robust-statistics replacement
  * for mean±kσ): a point is anomalous when its robust z-score
  *
  *   |0.6745 · (x − median) / MAD| > k,   MAD = median(|x − median|)
  *
  * Mean/stddev thresholds move WITH the outliers they hunt (one 100×
  * spike inflates σ enough to hide the next one); the median and MAD
  * have a 50% breakdown point, so a contaminated series still yields
  * honest bands. 0.6745 scales MAD to σ-equivalents under normality
  * (Φ⁻¹(0.75)), making `k` comparable to a z-score threshold.
  *
  * Scale shape: two aggregates over the (series, bucket) frame — the
  * per-series median, then (after one broadcast-size join back) the
  * per-series MAD. Both run Spark's exact `median` aggregate, whose
  * state is the series' bucket list — bounded by the time range (the
  * engine's series contract), never by raw event volume. Medians are
  * order-independent, so results are bit-stable across partitionings
  * and engines (the float-parity rule sums and means break).
  */
object Robust {

  /** Per-point frame: keys + bucket + value + `med`, `mad`,
    * `robust_z` (6dp), `outlier` (1/0). A degenerate series
    * (MAD = 0 — over half the points identical) answers null
    * robust_z/outlier rather than flagging every deviation from the
    * median: no dispersion signal, no detection — the
    * [[ChangePoint.ewmaChart]] degenerate convention.
    *
    * Leaves the internal base-frame cache to the session; long-lived
    * services should use [[madOutliersReleasable]] and release after
    * their action (the [[Slo.burnRatesReleasable]] convention). */
  def madOutliers(df: DataFrame, keyCols: Seq[String],
      bucketCol: String, valueCol: String, k: Double = 3.5)
      : DataFrame =
    madOutliersReleasable(df, keyCols, bucketCol, valueCol, k)._1

  /** [[madOutliers]] plus a release handle that unpersists the
    * internal cache — call it after the consuming action. */
  def madOutliersReleasable(df: DataFrame, keyCols: Seq[String],
      bucketCol: String, valueCol: String, k: Double = 3.5)
      : (DataFrame, () => Unit) = {
    require(keyCols.nonEmpty, "madOutliers needs at least one series key")
    require(k > 0.0, "threshold k must be positive")
    val keyCs = keyCols.map(col)
    // persisted: the median branch, the MAD branch, and the final
    // select all read this frame — without the pin the caller's
    // upstream aggregation would replay once per branch
    val base = df.select(keyCs :+ col(bucketCol).cast("long").as("__b")
      :+ col(valueCol).cast("double").as("__x"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = base.groupBy(keyCs: _*)
      .agg(median(col("__x")).as("med"))
    val withMed = base.join(med, keyCols)
    val mad = withMed.groupBy(keyCs: _*)
      .agg(median(abs(col("__x") - col("med"))).as("mad"))
    val rz = lit(0.6745) * (col("__x") - col("med")) / col("mad")
    val out = withMed.join(mad, keyCols)
      .select(keyCs ++ Seq(
        col("__b").as(bucketCol),
        col("__x").as(valueCol),
        col("med"), col("mad"),
        when(col("mad") > 0.0, round(rz, 6)).as("robust_z"),
        when(col("mad") > 0.0,
          when(abs(rz) > k, 1L).otherwise(0L)).as("outlier")): _*)
    (out, () => { base.unpersist(blocking = false); () })
  }
}
