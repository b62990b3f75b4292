package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`): brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane-LSH bucketed
  * variant as the scale path (buckets shrink the candidate set from n to
  * n/2^planes per probe on average; recall is tunable via `planes`).
  * All math is codegen'd higher-order functions — no UDFs.
  */
object Similarity {

  /** Dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Deterministic pseudo-random hyperplanes: element j of plane p is a
    * unit-free value derived from xxhash64(p, j) mapped to (-0.5, 0.5). */
  private def planeLit(p: Int, dim: Int, seed: Int): Column =
    array((0 until dim).map { j =>
      val h = scala.util.hashing.MurmurHash3
        .productHash((p, j, seed)).toDouble
      lit(h / Int.MaxValue.toDouble / 2.0)
    }: _*)

  /** Sign-bit signature of `v` against `planes` hyperplanes → a bucket id in
    * [0, 2^planes). */
  def hyperplaneSignature(v: Column, planes: Int, dim: Int,
      seed: Int = 7): Column =
    (0 until planes).map { p =>
      when(dot(v, planeLit(p, dim, seed)) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Brute-force cosine top-k: broadcast the (small) probe set against the
    * corpus, rank per probe. Exact; the baseline the ANN path is measured
    * against. */
  def knnBrute(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val shuffleN = corpus.sparkSession.sessionState.conf.numShufflePartitions
    // norms precomputed per row behind a repartition barrier: the pair scan
    // then costs one dot product, and the (often single-split) parquet input
    // is spread across cores
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("pv"))
      .withColumn("pn", norm(col("pv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv")))
      .repartition(shuffleN)
    val scored = broadcast(p).join(c, col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("pn") * col("cn") === 0, lit(0.0))
          .otherwise(dot(col("pv"), col("cv")) / (col("pn") * col("cn"))))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("probe_id", "neighbor_id", "cosine")
  }

  /** LSH-bucketed approximate top-k: `tables` independent sign-signature
    * hash tables (different hyperplane seeds); candidates are the union of
    * same-bucket points across tables, deduplicated, then exactly ranked.
    * At scale the bucket join replaces the broadcast cross join; recall ≈
    * 1-(1-p^planes)^tables with p the per-plane agreement probability —
    * tune `planes` (bucket size) and `tables` (recall) independently.
    * `multiprobe` additionally hashes each PROBE into every bucket one
    * sign-flip away (×(planes+1) probe rows, corpus side unchanged) — the
    * standard recall boost without growing the corpus index. */
  def knnLsh(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 4, tables: Int = 4,
      dim: Int = 64, multiprobe: Boolean = false): DataFrame = {
    val shuffleN = corpus.sparkSession.sessionState.conf.numShufflePartitions
    def withSigs(df: DataFrame, id: String, vec: String,
        probeSide: Boolean): DataFrame = {
      val base = df
        .select(col(idCol).as(id), col(vecCol).cast("array<double>").as(vec))
        .repartition(shuffleN) // barrier: keep sig exprs off the explode
      val sigCols = (0 until tables).flatMap { tbl =>
        val sig = hyperplaneSignature(col(vec), planes, dim, seed = 7 + tbl)
        val exact = Seq(struct(lit(tbl).as("tbl"), sig.as("sig")))
        val flipped =
          if (probeSide && multiprobe)
            (0 until planes).map(pl => struct(lit(tbl).as("tbl"),
              sig.bitwiseXOR(lit(1L << pl)).as("sig")))
          else Nil
        exact ++ flipped
      }
      base.select(col(id), col(vec),
        explode(array(sigCols: _*)).as("ts"))
        .select(col(id), col(vec),
          col("ts.tbl").as("tbl"), col("ts.sig").as("sig"))
    }
    val p = withSigs(probes, "probe_id", "pv", probeSide = true)
    val c = withSigs(corpus, "neighbor_id", "cv", probeSide = false)
    val cand = p.join(c, Seq("tbl", "sig"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "pv", "neighbor_id", "cv")
      .dropDuplicates("probe_id", "neighbor_id")
    val scored = cand.withColumn("cosine", cosine(col("pv"), col("cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("probe_id", "neighbor_id", "cosine")
  }
}
