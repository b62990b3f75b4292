package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical distribution drift between a reference corpus and a
  * current one — the monitoring primitive behind "did the crawl mix
  * shift?" and "does this training batch still look like the last
  * one?": per-category proportions with additive smoothing, KL
  * divergence contributions KL(P_cur ‖ Q_ref) = Σ p·ln(p/q), and the
  * Pearson chi-square terms (o − e)²/e against expectations scaled
  * from the reference — drift localizes to the categories that moved,
  * not just one scalar.
  *
  * Scale shape: one hash aggregate per side collapses each corpus to
  * its category histogram (vocabulary-sized, map-side combined), a
  * full-outer join aligns the two histograms, and the scalar totals
  * (N_ref, N_cur, K) ride a one-row cross join — no shuffle ever
  * carries corpus rows, only category cells. Smoothing (add-c over
  * the UNION's category set) keeps KL finite when a category appears
  * on one side only — exactly the case drift detection exists for.
  */
object Drift {

  /** Per-category drift frame: `n_ref`/`n_cur` raw counts (0 when
    * absent), smoothed proportions `p_ref`/`p_cur`, `kl_term`
    * (current-vs-reference KL contribution, nats) and `chi2_term`.
    * Totals are `sum(kl_term)` / `sum(chi2_term)` downstream. */
  def categoricalDrift(ref: DataFrame, cur: DataFrame, keyCol: String,
      smooth: Double = 0.5): DataFrame = {
    require(smooth > 0.0, "smoothing constant must be positive")
    val r = ref.groupBy(col(keyCol)).agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(col(keyCol)).agg(count(lit(1)).as("n_cur"))
    val joined = r.join(c, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum("n_ref").as("__tr"), sum("n_cur").as("__tc"),
      count(lit(1)).as("__k"))
    joined.crossJoin(totals)
      .withColumn("p_ref",
        (col("n_ref") + lit(smooth)) /
          (col("__tr") + lit(smooth) * col("__k")))
      .withColumn("p_cur",
        (col("n_cur") + lit(smooth)) /
          (col("__tc") + lit(smooth) * col("__k")))
      .withColumn("kl_term",
        round(col("p_cur") * log(col("p_cur") / col("p_ref")), 6))
      .withColumn("chi2_term", round(
        pow(col("n_cur") - col("__tc") * col("p_ref"), 2) /
          (col("__tc") * col("p_ref")), 6))
      .select(col(keyCol), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        col("kl_term"), col("chi2_term"))
  }
}
