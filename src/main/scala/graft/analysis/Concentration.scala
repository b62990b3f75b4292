package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration measures over a corpus mixture — the complement of
  * [[graft.pipeline.TextAnalysis.mixtureDiversity]]'s entropy read:
  * the Gini coefficient and top-share answer "how UNEQUAL is the
  * source distribution?" (entropy answers "how many effective
  * sources?"). A domain cap is usually tuned against exactly these
  * numbers.
  *
  * Gini over group weights x₍₁₎ ≤ … ≤ x₍ₙ₎ (ranked ascending):
  * G = 2·Σ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n — the standard discrete
  * (population) form. Integer arithmetic until ONE final expression
  * of exact longs, so engines agree bit-for-bit.
  */
object Concentration {

  /** Per-partition concentration: for each `partitionCols` slice
    * (e.g. lang), the Gini over `groupCol` weights (row counts, or
    * `sum(weightCol)` when given), the group count, the total, and
    * the top group's share (6dp). Ties rank deterministically by
    * (weight, group name).
    *
    * Scale shape: corpus rows collapse map-side to (partition, group)
    * cells; the rank window and the Gini fold run over CELLS (group
    * count per slice — small by nature). */
  def gini(df: DataFrame, partitionCols: Seq[String], groupCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val partCs = partitionCols.map(col)
    // weights ride decimal(38,6): Σ i·x amplifies by the group count
    // (rank i reaches n_groups), and with ANSI off a Long sum would
    // wrap SILENTLY — the d_crit overflow class. Scale 6 (not 0):
    // a fractional weight column must NOT be HALF_UP-rounded per row
    // (a 0.4 weight becoming 0 silently distorts gini/top_share);
    // 32 integer digits still dwarf any real corpus total
    val w = weightCol.map(c => sum(col(c).cast("decimal(38,6)")))
      .getOrElse(count(lit(1)).cast("decimal(38,6)"))
    val cells = df.groupBy(partCs :+ col(groupCol).as("g"): _*)
      .agg(w.as("x"))
    val wRank = Window.partitionBy(partCs: _*)
      .orderBy(col("x"), col("g"))
    val ranked = cells.withColumn("__i", row_number().over(wRank))
    ranked.groupBy(partCs: _*)
      .agg(
        count(lit(1)).as("n_groups"),
        sum(col("x")).as("__tot"),
        max(col("x")).as("__max"),
        sum(col("__i").cast("decimal(38,0)") * col("x")).as("__iwx"))
      .select(partCs ++ Seq(
        col("n_groups"),
        // display cast: a corpus total past 2^63 rows/tokens is not a
        // real input; the GINI math above never passes through Long.
        // round() first so a fractional-weight total reports the
        // nearest integer rather than silently flooring
        round(col("__tot"), 0).cast("long").as("total"),
        round(col("__max").cast("double") /
          col("__tot").cast("double"), 6).as("top_share"),
        round(
          lit(2.0) * col("__iwx").cast("double") /
            (col("n_groups").cast("decimal(38,0)") * col("__tot"))
              .cast("double") -
            (col("n_groups") + 1).cast("double") / col("n_groups"),
          6).as("gini")): _*)
  }
}
