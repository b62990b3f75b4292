package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the ClickHouse `retention`-function shape
  * (parametric-functions retention) generalized to the standard cohort
  * table: keys cohorted by first-active day, and for each (cohort,
  * day-offset) the count and fraction of the cohort active that day.
  *
  * Three narrow shuffles, all on pre-shrunk frames: (key, day) distinct
  * activity (collapses raw rows to at most keys × days), first-seen min
  * per key, and the final (cohort, offset) aggregation. No window over
  * raw data, no self-join — at 100 TB the raw scan feeds one hash
  * exchange of (key, day) pairs and everything after is
  * cardinality-bounded by keys × active-days. */
object Retention {

  /** (key, cohort, offset_days) — one row per key per active day. */
  def activity(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val act = df.select(col(keyCol), to_date(col(tsCol)).as("__day"))
      .distinct()
    val coh = act.groupBy(keyCol).agg(min(col("__day")).as("cohort"))
    act.join(coh, keyCol)
      .select(col(keyCol), col("cohort"),
        datediff(col("__day"), col("cohort")).cast("long")
          .as("offset_days"))
  }

  /** The cohort table: cohort day, offset, active count, cohort size,
    * retention rate (4 decimals). Offset 0 always has rate 1.0. */
  def table(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val act = activity(df, keyCol, tsCol)
    val sizes = act.filter(col("offset_days") === 0L)
      .groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    act.groupBy("cohort", "offset_days")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort")
      .withColumn("rate",
        round(col("n_active").cast("double") / col("n_cohort"), 4))
  }
}
