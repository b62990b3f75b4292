package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the cluster
  * structure SemDeDup-style curation, IVF cell assignment and
  * diversity-aware mixing all build on ([[Similarity]] trains its IVF
  * cells on a driver-side sample; this is the full-corpus iteration).
  *
  * Spark-first shape, per iteration:
  *   1. ASSIGN — a pure expression: distance to each of the k centroid
  *      literals (broadcast inside the plan, no join), argmin via
  *      struct-ordered `array_min`. Zero shuffle.
  *   2. UPDATE — explode the k assigned frames to (cluster, dim,
  *      component) and hash-aggregate per (cluster, dim): ONE narrow
  *      shuffle of n·dim longs per iteration, map-side combined; the
  *      k·dim result (tiny) is collected and folded into the next
  *      iteration's literals. Never an n×k join, never a global sort.
  *
  * Reproducibility is exact, not approximate: vectors are quantized to
  * integer grid points (`round(x·scale)` as long — the FLOAT→DOUBLE
  * widening and one multiply are IEEE-deterministic), distances are
  * 64-bit integer sums, and centroid updates integer-divide-and-round
  * through one exact double division — so sums never depend on
  * aggregation order and ANY engine replays the identical trajectory
  * (a float k-means is unreproducible across partitionings; this one
  * is bit-stable). Quantization error is bounded by 1/(2·scale) per
  * component, far below embedding noise at the default scale 10⁴.
  *
  * Init = the k lowest-id vectors (deterministic; k-means++ would add
  * a data-dependent random stream the replay contract disallows). An
  * iteration that empties a cluster keeps its previous centroid.
  *
  * Overflow bounds (checked loudly): |component|·scale < 2²⁰ keeps a
  * dim-2⁰⁰⁰ squared distance and a 2⁴³-row per-cluster sum inside
  * 64-bit; the audit pass piggybacks on the first subtotal aggregate.
  */
object Clustering {

  /** Quantize a float/double vector column to exact integer grid
    * points: round(x·scale) per component, as longs. */
  def quantize(vec: Column, scale: Long): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Exact squared L2 distance between two quantized (long) vectors. */
  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** Argmin cluster id for a quantized vector against centroid
    * literals; ties break to the lowest cluster id (struct ordering). */
  private def assignExpr(vq: Column, centroids: Seq[Array[Long]])
      : Column = {
    val scored = centroids.zipWithIndex.map { case (c, j) =>
      struct(dist2(vq, lit(c)).as("d"), lit(j).as("c"))
    }
    array_min(array(scored: _*))
  }

  /** Run `iters` Lloyd iterations at quantization `scale`; returns
    * (assignments, centroids) — assignments carry `idCol`, `cluster`
    * and the exact integer `dist2` to the final centroid; `centroids`
    * is the final quantized centroid list per cluster id. */
  def kMeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Long = 10000L)
      : (DataFrame, Seq[Array[Long]]) = {
    require(k > 0, "k must be positive")
    require(iters >= 1, "iters must be >= 1")
    require(scale > 0, "scale must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.select(col(idCol), quantize(col(vecCol), scale).as("__v"))
    q.persist()
    try {
      val init: Seq[Array[Long]] = q.orderBy(col(idCol)).limit(k)
        .select(col("__v")).as[Array[Long]].collect().toSeq
      require(init.size == k,
        s"kMeans: corpus has only ${init.size} rows for k=$k")
      val dim = init.head.length
      // loud overflow audit: dim·(2·maxAbs)² and n·maxAbs must fit i64
      val (maxAbs, nRows) = q.select(
          max(aggregate(col("__v"), lit(0L),
            (m, x) => greatest(m, abs(x)))),
          count(lit(1))).as[(Long, Long)].head()
      require(maxAbs <= 0 ||
        (BigInt(dim) * BigInt(2 * maxAbs).pow(2) <= Long.MaxValue / 4 &&
          BigInt(nRows) * BigInt(maxAbs) <= Long.MaxValue / 4),
        s"kMeans: scale=$scale overflows 64-bit sums " +
          s"(maxAbs=$maxAbs, dim=$dim, n=$nRows) — lower scale")

      var centroids = init
      for (_ <- 1 to iters) {
        val assigned = q.withColumn("__a",
          assignExpr(col("__v"), centroids))
        // (cluster, dim, sum, n) — the ONLY shuffle of the iteration
        val sums = assigned
          .select(col("__a.c").as("__c"),
            posexplode(col("__v")).as(Seq("__j", "__x")))
          .groupBy("__c", "__j")
          .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
          .as[(Int, Int, Long, Long)].collect()
        val byCluster = sums.groupBy(_._1)
        centroids = centroids.zipWithIndex.map { case (prev, cid) =>
          byCluster.get(cid) match {
            case None => prev // emptied cluster keeps its centroid
            case Some(rows) =>
              val c = new Array[Long](dim)
              rows.foreach { case (_, j, s, n) =>
                // one exact double division, then round HALF AWAY FROM
                // ZERO — SQL round() semantics (math.round alone is
                // half-toward-+inf and disagrees on negative halves)
                val v = s.toDouble / n
                c(j) = math.signum(v).toLong * math.round(math.abs(v))
              }
              c
          }
        }
      }
      val assignedFinal = q
        .withColumn("__a", assignExpr(col("__v"), centroids))
        .select(col(idCol), col("__a.c").as("cluster"),
          col("__a.d").as("dist2"))
      (assignedFinal, centroids)
    } finally q.unpersist()
  }
}
