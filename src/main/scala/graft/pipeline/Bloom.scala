package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter prefiltered decontamination.
  *
  * [[Curation.decontaminated]] broadcasts the benchmark's distinct
  * n-gram STRINGS and semi-joins the corpus grams against them. At
  * 100 TB that broadcast is the bottleneck: a large eval suite holds
  * ~10⁷–10⁸ distinct 13-grams ≈ gigabytes of strings, which every
  * executor must hold. A Bloom filter at ~12 bits/gram is 50–100×
  * smaller (10⁸ grams ≈ 150 MB of bitmap) with a ~0.1% false-positive
  * rate — and because decontamination CONFIRMS candidates with the
  * exact join afterward, the bloom changes only the work, never the
  * answer: false positives cost one extra exact-join row each, false
  * negatives don't exist.
  *
  * The filter is built driver-side from the benchmark's gram hashes
  * (the benchmark is the small side by contract — same assumption the
  * exact broadcast already makes) and ships to executors as one
  * literal long-array. Membership is a pure expression: k double-hashed
  * probes (Kirsch–Mitzenmacher: pos_i = h1 + i·h2 mod m, from TWO
  * xxhash64 values computed identically at build and probe time), each
  * probe one `element_at` + bit test — codegen-friendly, no UDF.
  *
  * Scale shape: corpus grams stream through the scan, the bloom test
  * drops ~all clean grams map-side, and only candidate-doc grams reach
  * the exact semi-join shuffle — the shuffle shrinks from all-grams to
  * (contaminated + ε) grams while the result stays bit-identical to
  * [[Curation.contaminationHits]].
  */
object Bloom {

  /** Bit positions of one (h1, h2) key in an m-bit filter —
    * Kirsch–Mitzenmacher double hashing. Shared by the driver-side
    * builder and (inlined as expressions) the probe, so both walk the
    * same arithmetic: Java and Spark longs overflow identically and
    * `pmod` matches `((x % m) + m) % m`. */
  private def positions(h1: Long, h2: Long, numHashes: Int,
      mBits: Long): Seq[Long] =
    (0 until numHashes).map { i =>
      val x = h1 + i.toLong * h2
      ((x % mBits) + mBits) % mBits
    }

  /** Build the bitmap from (h1, h2) hash pairs. `bitsPerKey`=12 with
    * 5 hashes ≈ 0.3% false positives. */
  private[graft] def buildBits(hashes: Array[(Long, Long)],
      bitsPerKey: Int, numHashes: Int): Array[Long] = {
    val mBits = math.max(64L, hashes.length.toLong * bitsPerKey)
    val words = new Array[Long](((mBits + 63) / 64).toInt)
    hashes.foreach { case (h1, h2) =>
      positions(h1, h2, numHashes, words.length.toLong * 64).foreach {
        p => words((p / 64).toInt) |= (1L << (p % 64)) }
    }
    words
  }

  /** Bitmaps up to this many longs (8 MB) ship as plan literals —
    * codegen'd bit tests, zero driver bookkeeping. Above it the plan
    * would carry the array through every copy/canonicalize/toString,
    * so the big-filter path (the module's 150 MB-at-10⁸-grams design
    * point) rides a broadcast variable instead. */
  private[graft] val literalMaxWords: Int = 1 << 20

  /** Membership test: AND of k double-hashed bit probes. `h1`/`h2`
    * must be the same xxhash64 spellings the builder used. Small
    * bitmaps inline as a literal (pure codegen'd expressions); large
    * ones ship ONCE per executor as a broadcast variable probed by a
    * deterministic UDF walking the identical arithmetic. The returned
    * release handle destroys that broadcast (noop on the literal
    * path) — call it AFTER the consuming action, the standard
    * Releasable contract. */
  private[graft] def mightContainReleasable(df: DataFrame,
      bits: Array[Long], h1: Column, h2: Column, numHashes: Int,
      maxLiteralWords: Int = literalMaxWords)
      : (Column, () => Unit) = {
    val mBits = bits.length.toLong * 64
    if (bits.length <= maxLiteralWords) {
      val bitsLit = lit(bits)
      val c = (0 until numHashes).map { i =>
        val p = pmod(h1 + lit(i.toLong) * h2, lit(mBits))
        // functions.shiftleft only takes a static shift; the SQL
        // spelling accepts a column
        val mask = call_function("shiftleft", lit(1L), (p % 64).cast("int"))
        (element_at(bitsLit, (p / 64).cast("int") + 1)
          .bitwiseAND(mask)) =!= 0L
      }.reduce(_ && _)
      (c, () => ())
    } else {
      val bc = df.sparkSession.sparkContext.broadcast(bits)
      val k = numHashes
      val probe = udf { (a: Long, b: Long) =>
        val words = bc.value
        var i = 0
        var ok = true
        while (ok && i < k) {
          val x = a + i.toLong * b
          val p = ((x % mBits) + mBits) % mBits
          ok = (words((p >> 6).toInt) & (1L << (p & 63))) != 0L
          i += 1
        }
        ok
      }
      (probe(h1, h2), () => { bc.destroy(); () })
    }
  }

  /** [[mightContainReleasable]] without the handle — literal-sized
    * filters only; a big filter probed through this leaks its
    * broadcast until the session ends (use the Releasable twin in
    * long-lived services). */
  private[pipeline] def mightContain(df: DataFrame, bits: Array[Long],
      h1: Column, h2: Column, numHashes: Int,
      maxLiteralWords: Int = literalMaxWords): Column =
    mightContainReleasable(df, bits, h1, h2, numHashes,
      maxLiteralWords)._1

  private def gramHashes(g: Column): (Column, Column) =
    (xxhash64(g), xxhash64(g, lit(1L)))

  /** [[Curation.contaminationHits]] with the bloom prefilter: same
    * output frame (doc_id, n_hits over distinct contaminated grams),
    * bit-identical result, candidate-pruned exact join. */
  def bloomContaminationHits(docs: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 13, bitsPerKey: Int = 12, numHashes: Int = 5)
      : DataFrame =
    bloomContaminationHitsReleasable(docs, idCol, textCol, bench,
      benchTextCol, n, bitsPerKey, numHashes)._1

  /** [[bloomContaminationHits]] plus a release handle that destroys
    * the big-filter broadcast (noop when the bitmap shipped as a plan
    * literal) — long-lived services call it after the consuming
    * action, the same convention as burnRatesReleasable. */
  def bloomContaminationHitsReleasable(docs: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 13, bitsPerKey: Int = 12, numHashes: Int = 5)
      : (DataFrame, () => Unit) = {
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("__g"))
      .distinct()
    // hashes computed IN Spark so builder and probe share the exact
    // xxhash64; the collect is the same small-side contract the exact
    // broadcast makes, but of 16-byte pairs instead of gram strings
    val (bh1, bh2) = gramHashes(col("__g"))
    val hashPairs = benchGrams.select(bh1.as("h1"), bh2.as("h2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bits = buildBits(hashPairs, bitsPerKey, numHashes)
    val corpusGrams = Curation.distinctGramFrame(docs, idCol, textCol, n)
    val (ch1, ch2) = gramHashes(col("__g"))
    val (test, release) =
      mightContainReleasable(docs, bits, ch1, ch2, numHashes)
    val candidates = corpusGrams.filter(test)
    // exact confirm: bloom false positives die here
    val hits = candidates
      .join(broadcast(benchGrams), Seq("__g"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    (hits, release)
  }

  /** The corpus with every bloom-confirmed contaminated document
    * removed — [[Curation.decontaminated]]'s twin on the bloom path. */
  def bloomDecontaminated(docs: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 13, bitsPerKey: Int = 12, numHashes: Int = 5)
      : DataFrame =
    docs.join(
      bloomContaminationHits(docs, idCol, textCol, bench, benchTextCol,
        n, bitsPerKey, numHashes).select(col(idCol)),
      Seq(idCol), "left_anti")
}
