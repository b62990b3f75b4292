package graft.analysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pattern-mining orchestration (reference drain/mine-patterns.ts:91-204):
  * deterministically sample ≤ `sampleSize` rows, mine templates with DRAIN
  * on the driver (exactly like the reference — the miner is inherently
  * sequential and the sample is small), then report per-cluster sample
  * counts and total-extrapolated estimates. */
object Patterns {

  final case class MinedPattern(patternId: Long, template: String,
      sampleCount: Long, estimatedCount: Long)

  /** Deterministic sample: ORDER BY hash (reference uses stable
    * cityHash64(id) sampling, eventDeltas.ts:304-309). */
  def sampleRows(df: DataFrame, bodyCol: String, idCol: String,
      sampleSize: Int): (Long, Seq[String]) = {
    val total = df.count()
    val sample = df
      .select(col(bodyCol).cast("string").as("body"), col(idCol))
      .orderBy(xxhash64(col(idCol)))
      .limit(sampleSize)
      .select("body")
      .collect()
      .map(_.getString(0))
      .toSeq
    (total, sample)
  }

  /** Patterns plus a `buckets`-bucket trend over the sample's time span
    * (reference mine-patterns.ts 24-bucket trend): sampled rows re-match to
    * their mined cluster and bucket by timestamp; counts extrapolate by
    * total/sample like the headline estimate. */
  def minePatternsWithTrend(spark: SparkSession, df: DataFrame,
      bodyCol: String, idCol: String, tsCol: String,
      sampleSize: Int = 10000, buckets: Int = 24): DataFrame = {
    import spark.implicits._
    val total = df.count()
    val sampled = df
      .select(col(bodyCol).cast("string").as("body"), col(idCol),
        unix_timestamp(col(tsCol)).as("ts"))
      .orderBy(xxhash64(col(idCol)))
      .limit(sampleSize)
      .select("body", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (sampled.isEmpty)
      return Seq.empty[(Long, String, Long, Long, Seq[Long])]
        .toDF("patternId", "template", "sampleCount", "estimatedCount",
          "trend")
    val drain = new Drain(maxClusters = Some(1000))
    sampled.foreach { case (b, _) => drain.addLogMessage(Masking.mask(b)) }
    val n = math.max(sampled.length, 1)
    val tsMin = sampled.iterator.map(_._2).min
    val span = math.max(sampled.iterator.map(_._2).max - tsMin + 1, 1L)
    val perCluster = scala.collection.mutable.Map.empty[Long, Array[Long]]
    sampled.foreach { case (b, ts) =>
      drain.matchLogMessage(Masking.mask(b)).foreach { c =>
        val arr = perCluster.getOrElseUpdate(c.id, new Array[Long](buckets))
        arr(math.min(((ts - tsMin) * buckets / span).toInt, buckets - 1)) += 1
      }
    }
    val scale = total.toDouble / n
    drain.allClusters.map { c =>
      val trend = perCluster.getOrElse(c.id, new Array[Long](buckets))
        .map(x => math.round(x * scale)).toSeq
      (c.id, c.template, c.size, math.round(c.size * scale), trend)
    }.toDF("patternId", "template", "sampleCount", "estimatedCount",
      "trend")
      .orderBy(desc("sampleCount"), col("patternId"))
  }

  /** Expression-only form of [[Masking.mask]]: the same rule chain as
    * codegen'd `regexp_replace`s, for DISTRIBUTED template
    * normalization — every row, not a driver-side sample. DRAIN stays
    * the fuzzy clusterer; this is the exact-template path that scales
    * to the full corpus. */
  def maskTemplate(line: Column): Column =
    Masking.rules.foldLeft(line.cast("string")) {
      case (c, (re, repl)) => regexp_replace(c, re, repl)
    }

  /** Deploy triage: which masked log templates are NEW, GONE, SURGING,
    * or DROPPING in (split, to] relative to the [from, split) baseline —
    * the "what changed after the deploy" question, answered over every
    * row instead of a mined sample.
    *
    * Scale shape: one scan of the range, one conditional-agg hash
    * shuffle keyed on the masked template (map-side combined), then
    * pure post-agg expressions — template cardinality, not row count,
    * bounds everything after the exchange. Rates normalize by each
    * window's length so unequal windows compare honestly; ratio and
    * rates round to 6 dp and the status thresholds compare the ROUNDED
    * ratio, so independent engines agree on the boundary. */
  def templateDiff(df: DataFrame, lineCol: String, tsCol: String,
      from: String, split: String, to: String,
      surgeRatio: Double = 2.0): DataFrame = {
    require(surgeRatio > 1.0, s"surgeRatio must exceed 1, got $surgeRatio")
    val (fi, si, ti) = (java.time.Instant.parse(from),
      java.time.Instant.parse(split), java.time.Instant.parse(to))
    require(fi.isBefore(si) && si.isBefore(ti),
      s"need from < split < to, got $from / $split / $to")
    // fractional seconds count: sub-second windows must not truncate to
    // a zero denominator (Infinity rates, everything "drop")
    val baseSecs = java.time.Duration.between(fi, si).toNanos / 1e9
    val curSecs = java.time.Duration.between(si, ti).toNanos / 1e9
    val ts = col(tsCol)
    val inBase = ts < lit(java.sql.Timestamp.from(si))
    val ratio = when(col("base_n") > 0, round(
      (col("cur_n") / curSecs) / (col("base_n") / baseSecs), 6))
    df.filter(ts >= lit(java.sql.Timestamp.from(fi)) &&
        ts < lit(java.sql.Timestamp.from(ti)))
      .groupBy(maskTemplate(col(lineCol)).as("template"))
      .agg(sum(when(inBase, 1L).otherwise(0L)).as("base_n"),
        sum(when(!inBase, 1L).otherwise(0L)).as("cur_n"))
      .withColumn("base_rate", round(col("base_n") / baseSecs, 6))
      .withColumn("cur_rate", round(col("cur_n") / curSecs, 6))
      .withColumn("ratio", ratio)
      .withColumn("status",
        when(col("base_n") === 0, "new")
          .when(col("cur_n") === 0, "gone")
          .when(col("ratio") >= surgeRatio, "surge")
          .when(col("ratio") <= 1.0 / surgeRatio, "drop")
          .otherwise("steady"))
  }

  /** Mine patterns; noiseThreshold drops clusters that hold less than that
    * fraction of the sample (reference noise 0.1 is applied upstream;
    * default 0 keeps all). */
  def minePatterns(spark: SparkSession, df: DataFrame, bodyCol: String,
      idCol: String, sampleSize: Int = 10000,
      noiseThreshold: Double = 0.0): DataFrame = {
    val (total, sample) = sampleRows(df, bodyCol, idCol, sampleSize)
    val drain = new Drain(maxClusters = Some(1000))
    sample.foreach(line => drain.addLogMessage(Masking.mask(line)))
    val n = math.max(sample.size, 1)
    val patterns = drain.allClusters
      .filter(c => c.size.toDouble / n >= noiseThreshold)
      .map(c => MinedPattern(c.id, c.template, c.size,
        math.round(c.size.toDouble * total / n)))
    import spark.implicits._
    patterns.toDF()
      .orderBy(desc("sampleCount"), col("patternId"))
  }
}
