package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key event sequences —
  * "what follows what": the navigation/journey primitive behind
  * funnel discovery, rare-transition anomaly triage, and synthetic
  * session generation. Each key's events order by (time, id) — the id
  * tie-break makes simultaneous events deterministic — and every
  * adjacent pair contributes one (from, to) observation; row
  * probabilities condition on the from-state.
  *
  * Scale shape: one hash shuffle on the key for the lead() window
  * (per-key state = that key's event count — the sessionize caveat:
  * salt hot keys upstream), then a vocabulary²-bounded hash aggregate;
  * probabilities are divisions of exact longs over a tiny window, so
  * results are bit-stable across engines and partitionings. */
object Transitions {

  /** One row per observed (from_state, to_state): `n` transitions and
    * `p` = n / Σ n over the from-state (6dp). Sequence ends contribute
    * no pair (no artificial terminal state). Null-state rows are
    * dropped up front — a null is the absence of a state, and keeping
    * them would make "sequence ended" and "next state is null"
    * indistinguishable in the lead(). */
  def matrix(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .filter(col(stateCol).isNotNull)
      .withColumn("__to", lead(col(stateCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .select(col(stateCol).as("from_state"), col("__to").as("to_state"))
    val counts = pairs.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_state"))
    counts
      .withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(wFrom), 6))
      .select("from_state", "to_state", "n", "p")
  }
}
