package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator / label-source agreement — the training-data QA
  * primitive behind "do my labelers (or my declared metadata and my
  * classifier) actually agree?": Cohen's kappa (Cohen 1960) corrects
  * raw agreement for the agreement two independent annotators would
  * reach by chance given their own label marginals, the correction
  * that stops a 95%-majority-class dataset from reporting 95%
  * "agreement" for free.
  *
  * Float-parity discipline: po and pe are ratios of EXACT integer
  * aggregates — kappa = (agree·n − S) / (n² − S) with
  * S = Σ_k nA_k·nB_k — so the whole statistic is integer math (in
  * decimal(38,0), the wrap-proof spelling) until one final double
  * division: bit-stable across partition orders and engines, no
  * float-sum ordering anywhere.
  */
object Agreement {

  /** One-row frame: `n` (double-labeled rows), `agree`, `po` (raw
    * agreement), `pe` (chance agreement from the marginals), `kappa`
    * (6dp; null when pe = 1 — both sources constant on one label, the
    * degenerate case where kappa is 0/0). Rows where either label is
    * null are dropped (no opinion ≠ an opinion).
    *
    * Scale shape: one hash aggregate collapses the corpus to the
    * (label_a, label_b) contingency table — vocabulary² cells at
    * most, map-side combined; marginals and totals are re-aggregates
    * of those cells, so corpus rows shuffle exactly once. Leaves the
    * cell cache to the session; long-lived services use
    * [[cohenKappaReleasable]] (the [[Slo.burnRatesReleasable]]
    * convention). */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String)
      : DataFrame =
    cohenKappaReleasable(df, aCol, bCol)._1

  /** [[cohenKappa]] plus a release handle that unpersists the
    * contingency-cell cache — call it after the consuming action. */
  def cohenKappaReleasable(df: DataFrame, aCol: String, bCol: String)
      : (DataFrame, () => Unit) = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dec = "decimal(38,0)"
    val totals = cells.agg(
      sum(col("__c")).cast(dec).as("n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
        .cast(dec).as("agree"))
    val ma = cells.groupBy("__a").agg(sum(col("__c")).as("__na"))
    val mb = cells.groupBy("__b").agg(sum(col("__c")).as("__nb"))
    // only labels both sources use contribute to chance agreement
    val s = ma.join(mb, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__na").cast(dec) * col("__nb")), lit(0)
        .cast(dec)).as("__s"))
    val out = totals.crossJoin(s)
      .withColumn("__n2", col("n") * col("n"))
      .select(
        col("n").cast("long").as("n"),
        col("agree").cast("long").as("agree"),
        when(col("n") > 0, round(
          col("agree").cast("double") / col("n").cast("double"), 6))
          .as("po"),
        when(col("n") > 0, round(
          col("__s").cast("double") / col("__n2").cast("double"), 6))
          .as("pe"),
        when(col("n") > 0 && col("__n2") =!= col("__s"), round(
          (col("agree") * col("n") - col("__s")).cast("double") /
            (col("__n2") - col("__s")).cast("double"), 6))
          .as("kappa"))
    (out, () => { cells.unpersist(blocking = false); () })
  }
}
