package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to every left row the most recent
  * right row with `right.on ≤ left.on`, per key — the logs↔metrics
  * correlation the reference expresses as a time-bucketed merge
  * (packages/common-utils/src/core/: charts merge on granularity
  * buckets); an as-of join is the exact-time generalization.
  *
  * Spark-first plan: NOT a range join (Catalyst would plan the
  * `l.ts >= r.ts` conjunct as a broadcast-nested-loop or a cross
  * product). Instead both sides are tagged and unioned, and one window
  * pass per key carries the latest right payload forward:
  *
  *   union → shuffle on `by` → sort (time, side) → running last(payload)
  *
  * One hash shuffle total, O(n log n) per partition, no row
  * amplification — the plan survives 100 TB where a range join cannot.
  * Hot keys inherit the usual window-skew caveat: a single key's rows
  * must fit one partition's sort spill; salt upstream if a key exceeds
  * that (the engine's `compile.Skew` patterns apply).
  */
object AsOfJoin {

  /** Backward as-of join (the common direction): latest right row at or
    * before each left row's time, per `by` key.
    *
    * @param on        timestamp column name, present on both sides
    * @param by        equi-join key columns, present on both sides
    * @param tolerance max allowed staleness in seconds (None = any);
    *                  matches older than this are nulled out, keeping
    *                  the left row (left-outer semantics either way)
    * @param rightPrefix prefix for the attached right columns; the
    *                  matched right timestamp arrives as
    *                  `rightPrefix + on`
    *
    * Determinism: right rows tying on (key, time) resolve to the
    * greatest payload struct (a total order over the remaining right
    * columns), so repeated runs — and the DuckDB oracle — agree.
    */
  def backward(left: DataFrame, right: DataFrame, on: String,
      by: Seq[String], tolerance: Option[Long] = None,
      rightPrefix: String = "right_"): DataFrame = {
    require(by.nonEmpty, "as-of join needs at least one key column")
    val payCols = right.columns.toSeq.filterNot(c =>
      by.contains(c) || c == on)
    // right rows: key + time + payload (matched time travels inside)
    val r = right.select(
      by.map(col) ++ Seq(
        col(on).as("__t"),
        lit(0).as("__side"),
        struct((col(on).as(on) +: payCols.map(col)): _*).as("__pay"),
        lit(null).cast(structType(left)).as("__lrow")): _*)
    // left rows: key + time + the whole original row
    val l = left.select(
      by.map(col) ++ Seq(
        col(on).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(structType(right, by, on, payCols)).as("__pay"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)
    // side 0 < 1 puts a right row at time t before a left row at t →
    // inclusive match; __pay last for deterministic equal-time ties
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val stale = tolerance.fold(lit(false)) { tol =>
      col("__t").cast("double") -
        col("__match").getField(on).cast("double") > tol.toDouble
    }
    val withMatch = matched.withColumn("__m",
      when(stale, lit(null).cast(matched.schema("__match").dataType))
        .otherwise(col("__match")))
    withMatch.select(
      left.columns.map(c => col("__lrow").getField(c).as(c)) ++
        (on +: payCols).map(c =>
          col("__m").getField(c).as(rightPrefix + c)): _*)
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)

  private def structType(right: DataFrame, by: Seq[String], on: String,
      payCols: Seq[String]) = {
    val f = right.schema
    org.apache.spark.sql.types.StructType(
      f(on).copy(name = on) +: payCols.map(c => f(c)))
  }
}
