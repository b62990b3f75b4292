package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-corpus health and dimensionality reduction.
  *
  * Before a 100-TB embedding corpus feeds ANN indexing or clustering,
  * two cheap passes pay for themselves: a HEALTH audit (null/NaN/zero
  * vectors crash or silently poison cosine math downstream — the
  * failure class the ANN shortlist's null filter catches one operator
  * too late) and a signed random projection (Johnson–Lindenstrauss /
  * Achlioptas 2001 ±1 entries) that shrinks vectors before the
  * expensive pairwise stages.
  *
  * Float-parity discipline: per-row norms fold the list sequentially
  * (both engines left-fold, so the doubles match bit-for-bit), and the
  * per-group norm stats are min/max/median — the order-independent
  * statistics — never a parallel mean. The projection matrix derives
  * from md5 (portable to any engine) rather than a JVM RNG, so the
  * "random" matrix is a pure function of (i, j) reproducible anywhere.
  */
object Embeddings {

  /** L2 norm via the shared codegen'd kernel ([[Similarity.norm]] /
    * `VectorOps.dot` — ascending-index summation, value-identical to
    * a row-engine's sequential list_sum, without the interpreted
    * HOF-lambda cost this module's scan otherwise pays per row). */
  private def l2(v: Column): Column = Similarity.norm(v)

  /** Symmetric per-vector int8 quantization audit — the storage move
    * that shrinks an embedding corpus 4× before ANN indexing: per
    * vector, scale = max|x|/127, code q_i = ⌊x_i/scale + 0.5⌋
    * (floor(+0.5) instead of round() — Spark's decimal-string HALF_UP
    * and a row-engine's binary round disagree on ties; floor never
    * does), and the reconstruction audit fields: `scale` (6dp),
    * `max_abs_err` = max_i |x_i − q_i·scale| (6dp — an
    * order-INDEPENDENT max, never a float sum) and `n_dims`. The
    * all-zero vector quantizes to scale 0 / error 0 rather than a
    * division blow-up.
    *
    * Scale shape: pure per-row HOF expressions — zero shuffle, rides
    * the scan. The codes themselves are `transform(...)` of the same
    * arithmetic when a caller wants them; the audit frame is what
    * gates. */
  def quantizeInt8Stats(df: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    // one codegen pass per row (VectorOps.Int8QuantStats): the HOF form
    // re-inlined the O(n) max-abs scale into the per-element error
    // lambda (project collapsing), making every row O(n²) interpreted
    val st = graft.functions.VectorOps.int8QuantStats(col(vecCol))
    val mx = element_at(st, 1)
    df.select(col(idCol),
      size(col(vecCol)).as("n_dims"),
      round(mx / lit(127.0), 6).as("scale"),
      when(mx === 0.0, lit(0.0))
        .otherwise(round(element_at(st, 2), 6)).as("max_abs_err"))
  }

  /** Per-group embedding health: vector counts, null / NaN-bearing /
    * zero-norm / wrong-dimension counts, and the norm distribution
    * (min / max / median, 6dp — order-independent stats only). One
    * hash aggregate; `dim` is the expected dimensionality. */
  def embeddingStats(df: DataFrame, groupCol: String, vecCol: String,
      dim: Int): DataFrame = {
    val v = col(vecCol)
    val isNull = v.isNull
    val hasNan = when(isNull, false).otherwise(
      exists(v, x => isnan(x.cast("double"))))
    val badDim = when(isNull, false).otherwise(size(v) =!= dim)
    // a NaN norm would poison min/max; the health counts carry those
    // rows, the distribution excludes them
    val norm = when(isNull || hasNan || badDim, lit(null).cast("double"))
      .otherwise(l2(v))
    val isZero = when(norm.isNull, false).otherwise(norm === 0.0)
    df.select(col(groupCol), isNull.as("__null"), hasNan.as("__nan"),
        badDim.as("__bad"), isZero.as("__zero"), norm.as("__norm"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__null"), 1L).otherwise(0L)).as("n_null"),
        sum(when(col("__nan"), 1L).otherwise(0L)).as("n_nan"),
        sum(when(col("__bad"), 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(col("__zero"), 1L).otherwise(0L)).as("n_zero"),
        round(min(col("__norm")), 6).as("norm_min"),
        round(max(col("__norm")), 6).as("norm_max"),
        round(median(col("__norm")), 6).as("norm_med"))
  }

  /** Signed (±1) random projection to `outDim` dimensions: out[j] =
    * Σ_i v[i]·sign(i, j), sign drawn from the md5 of "i_j" (first hex
    * nibble parity) — deterministic, engine-portable, and within the
    * Achlioptas family of JL projections (±1 entries, distances
    * preserved within (1±ε) for outDim = O(log n / ε²)).
    *
    * Scale shape: the sign matrix is a pure function of (i, j), so it
    * is hashed ONCE driver-side and shipped as a flat literal
    * `array<double>` (maxInDim·outDim cells, row-major); the per-row
    * fold is then arithmetic + `element_at` lookups only — zero
    * shuffle, zero per-row hashing, rides the scan. Vectors longer
    * than `maxInDim` answer null rather than silently truncating
    * (raise `maxInDim`; the literal costs 8·maxInDim·outDim bytes of
    * plan). Fold order (ascending i within each j) and the md5 parity
    * are unchanged from the per-row spelling, so values are
    * bit-identical to the portable oracle replay. */
  def randomProject(df: DataFrame, vecCol: String, outDim: Int,
      outCol: String = "projected", maxInDim: Int = 256): DataFrame = {
    require(outDim > 0, "outDim must be positive")
    require(maxInDim > 0, "maxInDim must be positive")
    // driver-side matrix: sign(i, j) = +1 iff the first hex nibble of
    // md5("i_j") is even — the same draw the oracle replays in SQL
    val digest = java.security.MessageDigest.getInstance("MD5")
    val signs: Array[Double] = Array.tabulate(maxInDim * outDim) { c =>
      val i = c / outDim + 1
      val j = c % outDim + 1
      val nib = (digest.digest(s"${i}_$j".getBytes("UTF-8"))(0) >> 4) & 0xf
      if (nib % 2 == 0) 1.0 else -1.0
    }
    val m = lit(signs)
    val v = col(vecCol)
    val proj = transform(sequence(lit(1), lit(outDim)), j =>
      aggregate(sequence(lit(1), size(v)), lit(0.0), (acc, i) =>
        acc + element_at(v, i).cast("double") *
          element_at(m, (i - 1) * outDim + j)))
    // size(v) = 0 makes sequence(1, 0) DESCEND to [1, 0] and
    // element_at(v, 0) always throws (the Dedup.shingles guard) — an
    // empty vector projects to the zero vector instead
    val zeroVec = transform(sequence(lit(1), lit(outDim)),
      _ => lit(0.0))
    df.withColumn(outCol,
      when(v.isNull || size(v) > maxInDim,
          lit(null).cast("array<double>"))
        .when(size(v) === 0, zeroVec)
        .otherwise(proj))
  }
}
