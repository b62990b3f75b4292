package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis — ClickHouse `windowFunnel` semantics (the function
  * family of the reference's storage engine; ClickHouse docs
  * parametric-functions windowFunnel): per key, the deepest prefix of an
  * ordered step sequence completed inside a sliding window anchored at
  * the chain's FIRST step. A chain is events e1…ek with
  * step(e_i) = i, ts(e1) ≤ ts(e2) ≤ … ≤ ts(ek) ≤ ts(e1) + window.
  *
  * The classic SQL shape is a k-way self-join (one join per step); this
  * implementation is one hash shuffle + an expression-only linear scan:
  * per key, the step events collect into a time-sorted array and a
  * single `aggregate` HOF pass runs the greedy reachability recurrence
  *
  *   best[0] = latest ts of any step-1 event seen so far
  *   best[i] = latest chain-start among chains reaching step i+1:
  *             on a step-i+1 event at t, if best[i-1] is set and
  *             t − best[i-1] ≤ window, best[i] = max(best[i], best[i-1])
  *
  * Keeping the LATEST viable chain start per level dominates every
  * other choice (a later start is always at least as extendable), so
  * the scan is exact, O(events·steps), and the per-key state is k
  * doubles. Events at equal timestamps may chain in either order
  * (ClickHouse's default non-strict mode; its strict_* variants are
  * opt-in there and out of scope here).
  *
  * State is bounded by a key's OWN step events (the same contract as
  * ClickHouse's windowFunnel, which buffers per-group events); the
  * non-step corpus never enters the array.
  */
object Funnel {

  private val NegInf = -1e300
  private val Thresh = -1e299

  /** Per-key deepest level reached (0 = has step events but never the
    * entry step). Keys with no step events emit no row. */
  def levels(df: DataFrame, keyCol: String, tsCol: String, stepCol: String,
      steps: Seq[String], windowSeconds: Double): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must differ")
    val k = steps.size
    val lvl = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(stepCol) === s, i).otherwise(acc)
      }
    val ev = df
      .withColumn("__lvl", lvl)
      .filter(col("__lvl") >= 0)
      .select(col(keyCol), col(tsCol).cast("double").as("__ts"),
        col("__lvl"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(struct(col("__ts"), col("__lvl"))))
        .as("__ev"))
    // aggregate(events, best[k] = -inf, greedy recurrence); the CASE
    // falls through to the untouched slot for every other index.
    val scan =
      s"""aggregate(__ev,
         |  array_repeat(CAST($NegInf AS DOUBLE), $k),
         |  (best, e) -> transform(best, (b, i) -> CASE
         |    WHEN i = e.__lvl AND i = 0 THEN greatest(b, e.__ts)
         |    WHEN i = e.__lvl AND element_at(best, i) > $Thresh
         |         AND e.__ts - element_at(best, i) <= $windowSeconds
         |      THEN greatest(b, element_at(best, i))
         |    ELSE b END),
         |  best -> size(filter(best, b -> b > $Thresh)))""".stripMargin
    ev.select(col(keyCol), expr(scan).as("level"))
  }

  /** Funnel report: one row per level 0…k with the number of keys whose
    * deepest level is exactly that, plus the cumulative count of keys
    * reaching AT LEAST that level (the conversion curve; level 0 rows
    * count keys with step events that never entered the funnel). */
  def report(df: DataFrame, keyCol: String, tsCol: String, stepCol: String,
      steps: Seq[String], windowSeconds: Double): DataFrame = {
    val l = levels(df, keyCol, tsCol, stepCol, steps, windowSeconds)
      .groupBy("level").agg(count(lit(1)).as("n_keys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("level"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // the level histogram is ≤ k+1 rows — a driver-scale frame, so the
    // unpartitioned cumulative window is O(k), not a data-volume sort
    l.withColumn("n_at_least", sum(col("n_keys")).over(w))
      .orderBy("level")
  }
}
