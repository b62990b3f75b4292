package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
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
