package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Schema/facet introspection services — the engine-service analogue of the
  * reference's `Metadata` class
  * (packages/common-utils/src/core/metadata.ts:254-2698): column listing,
  * map-key discovery, key-value autocomplete, value distributions. Each is
  * a small capped aggregation (the reference caps discovery scans at 3e6
  * rows and 15 s — metadata.ts:55-56,816-818; `maxScanRows` mirrors that).
  */
object Metadata {

  final case class FieldInfo(path: String, dataType: String,
      fromMap: Boolean)

  /** Bounded discovery scan: column-pruned select + a per-partition
    * `LocalLimit` cap. A global `df.limit(n)` would funnel every
    * partition's rows through ONE task before the downstream
    * explode/groupBy — the per-partition cap (maxScanRows split across
    * the scan's partitions) keeps the bound AND the parallelism.
    *
    * The bound is approximate, which is fine for discovery: with P
    * partitions the scan reads at most `max(1, maxScanRows/P) · P` rows
    * (≤ maxScanRows + P−1 when P ≤ maxScanRows; P is clamped so a
    * many-partition source can't blow past the cap by a partition-count
    * factor), and skewed partitions can under-fill their share — the
    * reference's own 3e6-row discovery cap is equally best-effort
    * (metadata.ts:55-56). Deriving P forces one extra round of physical
    * planning per discovery call; discovery endpoints are interactive
    * one-offs, not per-query hot path. */
  private def cappedScan(df: DataFrame, cols: Seq[Column],
      maxScanRows: Int): DataFrame = {
    val pruned = df.select(cols: _*)
    val parts = math.min(math.max(1, pruned.rdd.getNumPartitions),
      math.max(1, maxScanRows))
    ColumnBridge.localLimit(pruned,
      math.max(1, (maxScanRows.toLong / parts).toInt))
  }

  /** All queryable fields: physical columns plus one entry per discovered
    * map key (reference getAllFields metadata.ts:1422). */
  def allFields(df: DataFrame, mapKeySample: Int = 1000): Seq[FieldInfo] = {
    val phys = df.schema.fields.map(f =>
      FieldInfo(f.name, f.dataType.simpleString, fromMap = false))
    val mapCols = df.schema.fields.collect {
      case StructField(n, MapType(StringType, _, _), _, _) => n
    }
    val mapFields = mapCols.flatMap { mc =>
      mapKeys(df, mc, maxScanRows = mapKeySample)
        .collect().map(r =>
          FieldInfo(s"$mc.${r.getString(0)}", "string", fromMap = true))
    }
    (phys ++ mapFields).toSeq
  }

  /** Distinct keys of a map column with counts
    * (reference getMapKeys metadata.ts:641-950). */
  def mapKeys(df: DataFrame, mapCol: String,
      maxScanRows: Int = 3000000): DataFrame =
    cappedScan(df, Seq(col(mapCol)), maxScanRows)
      .select(explode(map_keys(col(mapCol))).as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("key"))

  /** Distinct values of one map key (reference getMapValues :1040). */
  def mapValues(df: DataFrame, mapCol: String, key: String,
      maxValues: Int = 100, maxScanRows: Int = 3000000): DataFrame =
    cappedScan(df, Seq(element_at(col(mapCol), key).as("value")),
      maxScanRows)
      .filter(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("value"))
      .limit(maxValues)

  /** JSON key discovery with nested paths (reference getJSONKeys
    * metadata.ts:951 walks nested objects): dotted paths down to
    * `maxDepth` levels, with per-path occurrence counts. Each level
    * re-parses the child object strings via `from_json` to a string map
    * (nested objects render as their JSON text); malformed JSON rows and
    * non-object values contribute nothing. */
  def jsonKeys(df: DataFrame, jsonCol: String,
      maxScanRows: Int = 3000000, maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val capped = cappedScan(df,
      Seq(col(jsonCol).cast("string").as("__j")), maxScanRows)
    // frontier at depth d: (prefix, __j) pairs where __j is the JSON text
    // of a (possibly nested) object; paths accumulate across levels
    var frontier = capped.select(lit("").as("__prefix"), col("__j"))
    var acc: DataFrame = null
    for (_ <- 1 to maxDepth) {
      val lv = frontier.select(col("__prefix"),
        explode(from_json(col("__j"),
          MapType(StringType, StringType)))
          .as(Seq("__k", "__v")))
        .select(
          when(col("__prefix") === "", col("__k"))
            .otherwise(concat(col("__prefix"), lit("."), col("__k")))
            .as("path"),
          col("__v"))
      val keys = lv.select(col("path"))
      acc = if (acc == null) keys else acc.unionAll(keys)
      frontier = lv.filter(col("__v").startsWith("{"))
        .select(col("path").as("__prefix"), col("__v").as("__j"))
    }
    acc.groupBy(col("path").as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("key"))
  }

  /** Facet autocomplete: top values per column in ONE pass over the scan
    * (reference getKeyValues :2431 runs one query per key; a single
    * explode+groupBy is the Spark-native shape). */
  def keyValues(df: DataFrame, columns: Seq[String],
      maxValuesPerKey: Int = 20, maxScanRows: Int = 3000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = columns.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val counted = cappedScan(df, columns.map(col), maxScanRows)
      .select(explode(map(pairs: _*)).as(Seq("key", "value")))
      .filter(col("value").isNotNull)
      .groupBy("key", "value").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("key").orderBy(desc("cnt"), col("value"))
    counted.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxValuesPerKey)
      .groupBy("key")
      .agg(collect_list(col("value")).as("values"))
      .orderBy("key")
  }

  /** Bounded-state facet autocomplete: same output shape as [[keyValues]]
    * but per-key counts come from the Misra-Gries sketch
    * ([[graft.functions.FrequentItems]]) instead of an exact
    * groupBy(key, value) — each map-side partial ships at most
    * `sketchCapacity` counters per key through the shuffle regardless of
    * the column's cardinality, so a 100-TB facet scan over an id-like
    * column cannot blow up the exchange the way the exact path's
    * per-distinct-value rows can. Counts are under-estimates (deficit
    * ≤ n/(capacity+1)); any value with frequency above that bound is
    * guaranteed to surface, which is exactly the autocomplete contract.
    * With `sketchCapacity` ≥ the true distinct count the result is
    * identical to [[keyValues]]. */
  def keyValuesSketched(df: DataFrame, columns: Seq[String],
      maxValuesPerKey: Int = 20, sketchCapacity: Int = 256,
      maxScanRows: Int = 3000000): DataFrame = {
    import graft.functions.FrequentItems
    val pairs = columns.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val sketched = cappedScan(df, columns.map(col), maxScanRows)
      .select(explode(map(pairs: _*)).as(Seq("key", "value")))
      .filter(col("value").isNotNull)
      .groupBy("key")
      .agg(FrequentItems.freqItems(col("value"), sketchCapacity).as("m"))
    sketched
      .select(col("key"), explode(col("m")).as(Seq("value", "cnt")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(desc("cnt"), col("value"))))
      .filter(col("rk") <= maxValuesPerKey)
      .groupBy("key")
      .agg(collect_list(col("value")).as("values"))
      .orderBy("key")
  }

  /** Label names + top values for the rows a PromQL selector matches —
    * the reference's `timeSeriesTags` autocomplete surface
    * (packages/api/src/routers/api/prometheus.ts:792-793: ClickHouse's
    * timeSeriesTags table function behind metric label dropdowns). The
    * label universe is every string-typed physical column (the
    * well-known labels — MetricName, ServiceName, …) plus the entries
    * of every string-keyed map column (Attributes); `selectors` (bare
    * PromQL instant selectors) narrow the row set first so values
    * reflect the metric being autocompleted — multiple selectors union
    * their row sets, the Prometheus `match[]` repetition semantics (a
    * row matching several selectors can count more than once toward
    * frequency rank, which only matters past the value cap) — and
    * `onlyLabel` restricts the output to one label (the label-VALUES
    * dropdown call). The scan is capped like every discovery path;
    * values rank by frequency then lexically. Output: (label, values
    * array), ordered by label. */
  def timeSeriesTags(df: DataFrame, selectors: Seq[String] = Nil,
      onlyLabel: Option[String] = None, maxValuesPerLabel: Int = 100,
      maxScanRows: Int = 3000000): DataFrame = {
    val sel = selectors.filter(_.nonEmpty) match {
      case Nil => df
      case ss => ss.map(s => graft.metrics.PromQl.selectorFrame(df, s))
        .reduce(_.unionByName(_))
    }
    val strCols = sel.schema.fields.collect {
      case StructField(n, StringType, _, _) => n
    }.toSeq
    val mapCols = sel.schema.fields.collect {
      case StructField(n, MapType(StringType, _, _), _, _) => n
    }.toSeq
    require(strCols.nonEmpty || mapCols.nonEmpty,
      "no string or map columns to discover labels from")
    val capped = cappedScan(sel, (strCols ++ mapCols).map(col),
      maxScanRows)
    // ONE pass over the capped rows: physical-column pairs and map
    // entries concat into a single exploded array — one select per
    // column would re-run the selector filter and scan per column
    val strPairs = strCols.map(c => array(struct(
      lit(c).as("label"), col(c).as("value"))))
    // coalesce: a null map would null the whole concat and silently
    // drop the row's physical-column pairs too
    val mapPairs = mapCols.map(c => coalesce(
      transform(map_entries(col(c)), e =>
        struct(e.getField("key").as("label"),
          e.getField("value").cast("string").as("value"))),
      array().cast("array<struct<label:string,value:string>>")))
    val pairs = capped
      .select(explode(concat(strPairs ++ mapPairs: _*)).as("p"))
      .select(col("p.label").as("label"), col("p.value").as("value"))
      .filter(col("value").isNotNull)
    val wanted = onlyLabel.fold(pairs)(l => pairs.filter(col("label") === l))
    val counted = wanted.groupBy("label", "value")
      .agg(count(lit(1)).as("cnt"))
    // per-label top-N WITHOUT a per-label window: a label can have one
    // distinct value per row (an id-shaped attribute key), and a
    // window would funnel all of them through one sort task — the
    // exact single-task gather the ANN shortlists eliminated. Same
    // two-stage sorted-slice shape: partition-local top-N partials on
    // (label, partition), then one ≤ partitions × N merge per label.
    // Ordering: cnt desc (negated into the ascending struct sort),
    // then value asc.
    def topStage(d: DataFrame, keys: Seq[Column]): DataFrame = d
      .groupBy(keys: _*)
      .agg(slice(array_sort(collect_list(struct(
        (lit(0L) - col("cnt")).as("negCnt"), col("value")))),
        1, maxValuesPerLabel).as("__xs"))
      .select((keys :+ explode(col("__xs")).as("__x")): _*)
      .select((keys :+ (lit(0L) - col("__x.negCnt")).as("cnt")
        :+ col("__x.value").as("value")): _*)
    val partial = topStage(
      counted.withColumn("__pid", spark_partition_id()),
      Seq(col("label"), col("__pid")))
    topStage(partial, Seq(col("label")))
      .groupBy("label")
      // final per-label collect is ≤ maxValuesPerLabel structs; sort
      // them (collect_list order is not deterministic) and strip to
      // the ranked values
      .agg(transform(array_sort(collect_list(struct(
        (lit(0L) - col("cnt")).as("negCnt"), col("value")))),
        x => x.getField("value")).as("values"))
      .orderBy("label")
  }

  /** Distinct label sets of the rows one or more PromQL selectors
    * match — the native Prometheus `/api/v1/series` answer shape
    * (the reference's prometheus router has no /series proxy; this
    * endpoint exceeds its list and reads the engine's own metrics
    * frame). Label surface = every string column plus every
    * map<string,_> entry, the [[timeSeriesTags]] discovery surface;
    * null values drop from the set rather than emitting a null label,
    * and an Attributes key that SHADOWS a physical column (e.g. a map
    * entry named 'ServiceName') loses to the column — one label per
    * name, deterministically, since duplicate JSON keys in a label
    * set are invalid under Prometheus label-set semantics.
    *
    * One capped scan → one distinct. A MapType column can't be grouped,
    * so each row's label set canonicalizes to a label-sorted
    * `array<struct<label,value>>` (groupable, orderable) — the output
    * is one `labels` array column per distinct series, ordered, for
    * the caller to render. Multiple selectors union (Prometheus
    * match[] semantics); an optional [from, to] bound on `timeCol`
    * narrows the scan first. */
  def seriesSets(df: DataFrame, selectors: Seq[String],
      from: Option[java.sql.Timestamp] = None,
      to: Option[java.sql.Timestamp] = None,
      timeCol: String = "TimeUnix",
      maxScanRows: Int = 3000000): DataFrame = {
    val sels = selectors.filter(_.nonEmpty)
    require(sels.nonEmpty, "at least one non-empty selector is required")
    val sel = sels.map(s => graft.metrics.PromQl.selectorFrame(df, s))
      .reduce(_.unionByName(_))
    val timed = (from.map(f => col(timeCol) >= lit(f)) ++
      to.map(t => col(timeCol) <= lit(t)))
      .foldLeft(sel)(_.filter(_))
    val strCols = timed.schema.fields.collect {
      case StructField(n, StringType, _, _) => n
    }.toSeq
    val mapCols = timed.schema.fields.collect {
      case StructField(n, MapType(StringType, _, _), _, _) => n
    }.toSeq
    require(strCols.nonEmpty || mapCols.nonEmpty,
      "no string or map columns to build label sets from")
    val empty = array().cast("array<struct<label:string,value:string>>")
    val strPairs = strCols.map(c =>
      when(col(c).isNotNull,
        array(struct(lit(c).as("label"), col(c).as("value"))))
        .otherwise(empty))
    val mapPairs = mapCols.map(c => coalesce(
      filter(
        transform(map_entries(col(c)), e =>
          struct(e.getField("key").as("label"),
            e.getField("value").cast("string").as("value"))),
        p => p.getField("value").isNotNull),
      empty))
    // left-fold keeps the FIRST struct per label name: string columns
    // precede map entries in the concat, so a shadowing map key loses
    // to the physical column; label sets are small (≤ tens), so the
    // O(labels²) exists() probe stays trivial per row
    val all = concat(strPairs ++ mapPairs: _*)
    val deduped = aggregate(all, empty, (acc, x) =>
      when(exists(acc, y =>
        y.getField("label") === x.getField("label")), acc)
        .otherwise(concat(acc, array(x))))
    cappedScan(timed, (strCols ++ mapCols).map(col), maxScanRows)
      .select(sort_array(deduped).as("labels"))
      .distinct()
      .orderBy("labels")
  }

  /** Numeric distribution of an expression: count/min/max/avg + quantile
    * ladder (reference getValuesDistribution :1995). */
  def valuesDistribution(df: DataFrame, expression: String): DataFrame = {
    val e = expr(expression).cast("double")
    df.agg(
      count(e).as("cnt"),
      min(e).as("min"), max(e).as("max"), avg(e).as("avg"),
      percentile_approx(e, lit(0.5), lit(10000)).as("p50"),
      percentile_approx(e, lit(0.9), lit(10000)).as("p90"),
      percentile_approx(e, lit(0.99), lit(10000)).as("p99"))
  }
}
