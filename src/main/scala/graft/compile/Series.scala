package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CoreFunctions._
import graft.ir.{DateRange, RatioMode}

/** Series post-processing: gap filling and ratio computation — engine-side
  * versions of what the reference does client-side
  * (fillNulls types.ts:1211; computeResultSetRatio clickhouse/index.ts:391-485).
  */
object Series {

  /** Fill missing time buckets with a constant: generate the full bucket
    * spine with sequence()+explode, cross with observed group values, left
    * join (the reference's disabled WITH FILL, renderChartConfig.ts:1637).
    * `bucketCol` must hold epoch-aligned timestamps at `stepSeconds`. */
  def fillGaps(df: DataFrame, bucketCol: String, stepSeconds: Long,
      range: DateRange, groupCols: Seq[String],
      fill: Map[String, Column]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val from = range.from.getEpochSecond / stepSeconds * stepSeconds
    val to = range.to.getEpochSecond
    val spine = Seq((from, to)).toDF("__from", "__to")
      .select(explode(sequence(col("__from"), col("__to"),
        lit(stepSeconds))).as("__epoch"))
      .select(timestamp_seconds(col("__epoch")).as(bucketCol))
    val groups =
      if (groupCols.isEmpty) spine
      else spine.crossJoin(df.select(groupCols.map(col): _*).distinct())
    val joined = groups.join(df, bucketCol +: groupCols, "left")
    fill.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), v))
    }
  }

  /** Ratio of two value columns (reference computeResultSetRatio,
    * clickhouse/index.ts:391-485):
    *  - PerGroup: a / b per row;
    *  - ShareOfTotal: a / sum(b) over the same time bucket — the
    *    DENOMINATOR column's bucket total across all groups, so grouped
    *    lines decompose the blended rate and sum to the ungrouped value.
    * A group absent from the (filtered) numerator contributes ZERO, not
    * "no data" — a zero-error group reads 0%, not N/A (reference :437-438).
    * Division by a null/zero denominator yields null. */
  def ratio(df: DataFrame, mode: RatioMode, numCol: String,
      denCol: String, bucketCol: String = TimeBucketAlias,
      outCol: String = "ratio"): DataFrame = {
    val num = coalesce(col(numCol).cast("double"), lit(0.0))
    mode match {
      case RatioMode.PerGroup =>
        df.withColumn(outCol,
          when(col(denCol).isNull || col(denCol) === 0, lit(null))
            .otherwise(num / col(denCol)))
      case RatioMode.ShareOfTotal =>
        import org.apache.spark.sql.expressions.Window
        val total = sum(col(denCol)).over(Window.partitionBy(col(bucketCol)))
        df.withColumn(outCol,
          when(total.isNull || total === 0, lit(null))
            .otherwise(num / total))
    }
  }

  /** "Compare to previous period" overlay: each (bucket, group) point
    * next to the SAME series `offsetSeconds` earlier — the chart
    * toggle that draws last week under this week. Implemented as ONE
    * pass over the series frame: every row projects twice (at its own
    * bucket as the current value, at bucket+offset as the previous-
    * period contribution) and one hash aggregate pairs them — no
    * self-join, so the series' upstream lineage (scan + aggregation)
    * is NOT computed twice. Points whose previous period is missing
    * keep a null `prevCol`; delta/percent math is the caller's (it
    * depends on the metric's semantics). Contract: one row per
    * (bucket, groups) — a series frame — and `bucketCol` holds
    * epoch-second numbers (unix_timestamp a timestamp bucket first),
    * so the shift is exact integer arithmetic. */
  def compareWindow(df: DataFrame, bucketCol: String, valueCol: String,
      offsetSeconds: Long, groupCols: Seq[String] = Nil,
      prevCol: String = "prev_value"): DataFrame = {
    require(offsetSeconds > 0, "offsetSeconds must be positive")
    require(df.schema(bucketCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$bucketCol must be an epoch-second numeric column " +
        "(unix_timestamp timestamps first)")
    val keep = df.columns.filterNot(c =>
      c == bucketCol || c == valueCol || groupCols.contains(c))
    require(keep.isEmpty,
      s"compareWindow expects only bucket/value/group columns; extra: " +
        keep.mkString(", "))
    val cur = df.select(col(bucketCol) +: col(valueCol).as("__v") +:
      lit(1).as("__cur") +: groupCols.map(col): _*)
    val shifted = df.select(
      (col(bucketCol) + offsetSeconds).as(bucketCol) +:
        col(valueCol).as("__v") +: lit(0).as("__cur") +:
        groupCols.map(col): _*)
    cur.unionByName(shifted)
      .groupBy((col(bucketCol) +: groupCols.map(col)): _*)
      .agg(
        max(when(col("__cur") === 1, col("__v"))).as(valueCol),
        max(when(col("__cur") === 0, col("__v"))).as(prevCol),
        max(col("__cur")).as("__has"))
      // rows that exist only as a shifted contribution (their target
      // bucket has no current point) are not part of the overlay
      .filter(col("__has") === 1)
      .drop("__has")
  }
}
