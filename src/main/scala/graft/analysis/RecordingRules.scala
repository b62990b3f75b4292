package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recording rules — the log-to-metric extraction layer: a fleet of
  * named rules, each "count or sum rows matching a predicate, by a
  * group expression, at a step", continuously materialized for
  * dashboards (Prometheus recording rules / the reference's scheduled
  * chart queries).
  *
  * The point of this operator is the evaluation shape: ALL rules run in
  * ONE scan of the raw table. Each row builds an array of per-rule
  * (rule, group) tags — empty for rules it misses — explodes only the
  * matches, and one (rule, group, bucket) hash aggregate with map-side
  * combine produces every rule's series. N rules cost one scan + one
  * shuffle of the MATCHING rows, not N scheduled queries × N scans —
  * at 100 TB the scan is the cost, so rule fleets are ~free beyond the
  * first. Count and sum (avg = sum/count downstream) cover the
  * reference's chart aggregations; predicates and groups are arbitrary
  * Columns (compile lucene via LuceneCompiler upstream). */
object RecordingRules {

  /** One rule: keep rows where `where`, group by `group` (cast to
    * string — series labels), bucket at `stepSeconds`, aggregate
    * `value` (count rows when you only need rates — pass lit(1.0)). */
  final case class Rule(name: String, where: Column, group: Column,
      value: Column, stepSeconds: Long) {
    require(stepSeconds > 0, s"rule $name: stepSeconds must be positive")
  }

  /** (rule, bucket, grp, n, sum_v) for every rule in one pass.
    * `bucket` is the epoch-second window start at the rule's own step. */
  def evaluate(df: DataFrame, tsCol: String, rules: Seq[Rule])
      : DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    // one tag struct per MATCHING rule; non-matches contribute nothing.
    // Bucketing reuses the engine's one timeBucket definition.
    val tags = array(rules.map { r =>
      when(r.where, struct(
        lit(r.name).as("rule"),
        unix_timestamp(graft.functions.CoreFunctions
          .timeBucket(col(tsCol), r.stepSeconds)).as("bucket"),
        r.group.cast("string").as("grp"),
        r.value.cast("double").as("v")))
    }: _*)
    // drop non-matches INSIDE the array before exploding, so the
    // fan-out is per-row matches, not rules × rows
    df.select(explode(filter(tags, _.isNotNull)).as("__tag"))
      .select(col("__tag.rule").as("rule"), col("__tag.bucket").as("bucket"),
        col("__tag.grp").as("grp"), col("__tag.v").as("v"))
      .groupBy("rule", "bucket", "grp")
      // n counts NON-NULL value samples (SQL AVG semantics, so
      // sum_v / n is a correct average even for nullable values; with
      // value = lit(1.0) it is exactly the matching-row count)
      .agg(count(col("v")).as("n"), sum(col("v")).as("sum_v"))
  }
}
