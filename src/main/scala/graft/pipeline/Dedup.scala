package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication suite for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup. Everything is built from codegen'd built-in
  * functions (no UDFs); pair generation goes through bucket-join patterns
  * (explode → shuffle on bucket key → self-join) that scale horizontally —
  * never an O(n²) cross join on the full corpus.
  */
object Dedup {

  /** Whitespace tokens of normalized text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Target parallelism for pair-generation stages: the session's shuffle
    * partition count (testdata parquet often arrives as ONE input split —
    * without an explicit repartition the whole pipeline runs on one core). */
  private def defaultParallelism(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** n-gram shingles (token n-grams joined with spaces), distinct. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
        i => concat_ws(" ", (0 until n).map(j =>
          element_at(toks, (i + j).cast("int"))): _*)))
  }

  /** Exact dedup: normalized-text hash, keep the smallest id per group.
    * Single hash-shuffle; at 100 TB this is the cheapest first pass. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(lower(col(textCol))).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: k permutation-free min-hashes
    * h_i(S) = min over shingles s of xxhash64(s, i). */
  def minhashSignature(shinglesCol: Column, k: Int = 16): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shinglesCol,
        s => xxhash64(s, i))))

  /** Same over pre-hashed (long) shingles — re-mixing the hash with the
    * function index keeps the k functions independent. */
  def minhashSignatureFromHashes(hashesCol: Column, k: Int = 16): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hashesCol,
        h => xxhash64(h, i))))

  /** MinHash + LSH banding: signature split into `bands` bands; docs
    * sharing any band hash become candidate pairs; candidates verified with
    * exact shingle Jaccard. Returns (id_a, id_b, est_jaccard, jaccard).
    *
    * Scale path: explode to (band_idx, band_hash) — one shuffle on the band
    * key; bucket sizes are data-dependent but near-dup clusters are small by
    * construction. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    // Two repartition barriers: (1) spread small/1-partition inputs across
    // cores, (2) stop CollapseProject from inlining the shingle expression
    // into the k minhash exprs and the signature into the band exprs —
    // without the barrier every exploded band row re-tokenizes the text
    // (k×bands× recompute, catastrophic on wide rows).
    // Shingles are carried as 64-bit hashes from here on: Jaccard over
    // long arrays is identical modulo hash collisions (~n²/2⁶⁴) and the
    // pair scan compares 8-byte values instead of strings.
    val withSh = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh",
        array_distinct(transform(shingles(col("text"), shingleN),
          s => xxhash64(s))))
      .filter(size(col("sh")) > 0)
      .repartition(defaultParallelism(df))
    val withSig = withSh
      .withColumn("sig", minhashSignatureFromHashes(col("sh"), k))
      .repartition(defaultParallelism(df))
    def bandHash(sig: Column, b: Int): Column =
      xxhash64(concat_ws(",",
        slice(sig, b * rows + 1, rows).cast("array<string>")))
    // the band join carries only (id, sig): duplicating the (possibly
    // long) shingle array 8× through the explode shuffle would dominate
    // IO; shingles are re-attached below for surviving candidates only
    val banded = withSig.select(col("id"), col("sig"),
      size(col("sh")).as("sz"),
      posexplode(array((0 until bands).map(b =>
        bandHash(col("sig"), b)): _*))
        .as(Seq("band_idx", "band_hash")))
    val a = banded.select(col("band_idx"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"), col("sz").as("sz_a"))
    val b = banded.select(col("band_idx"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"), col("sz").as("sz_b"))
    // dedupe without a shuffle: keep a pair only in its FIRST matching
    // band (all earlier bands must differ) — cheaper at scale than
    // dropDuplicates (note: re-deriving band hashes from the carried sig
    // here measures ~10× faster end-to-end than shipping a precomputed
    // band-hash array through the explode shuffle)
    val firstMatch = (0 until bands).map { bi =>
      col("band_idx") === bi && (0 until bi)
        .map(j => bandHash(col("sig_a"), j) =!= bandHash(col("sig_b"), j))
        .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    val cand = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      // EXACT prune: J ≤ min(|a|,|b|)/max(|a|,|b|) — a scalar compare
      // that can never drop a qualifying pair
      .filter(least(col("sz_a"), col("sz_b")).cast("double") /
        greatest(col("sz_a"), col("sz_b")) >= minJaccard)
      .filter(firstMatch)
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0)),
          lit(0.0), (acc, v) => acc + v) / k)
      // cheap signature-agreement prefilter before the exact set math:
      // a true pair at j=minJaccard clears est ≥ minJaccard/2 with
      // probability ≥ 99.5% at k=16, and random band-collision junk
      // (the bulk of candidates on small-vocabulary corpora) dies here
      .filter(col("est_jaccard") >= minJaccard / 2)
      .select("id_a", "id_b", "est_jaccard")
    // re-attach shingle arrays for the (small) candidate set and verify
    val shById = withSh.select(col("id"), col("sh"))
    cand
      .join(shById.select(col("id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(shById.select(col("id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("jaccard", exactJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** Exact Jaccard over two distinct-shingle arrays. */
  def exactJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** n-gram Jaccard scoring of a (small, broadcast) probe set against the
    * corpus: all (probe, doc) pairs with jaccard ≥ threshold. */
  def ngramJaccardProbe(probes: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    // barrier: materialize HASHED shingles per row before the pair join
    // (see minhashLsh) — the nested-loop pair scan then intersects 8-byte
    // values; Jaccard is identical modulo ~n²/2⁶⁴ hash collisions
    def prep(d: DataFrame, suffix: String): DataFrame =
      d.select(col(idCol).as(s"id$suffix"),
        array_distinct(transform(shingles(col(textCol), n),
          s => xxhash64(s))).as(s"sh$suffix"))
        .repartition(defaultParallelism(d))
    val p = prep(probes, "_a")
    val c = prep(corpus, "_b")
    // general probe-vs-corpus contract: every (probe, doc) pair with
    // distinct ids — when both sides of a pair are probes the mirrored
    // pair appears too (callers wanting dedup-scan output filter id_a<id_b).
    // EXACT prune before the set math: J ≤ min(|a|,|b|)/max(|a|,|b|), a
    // two-long compare that kills most of the nested-loop pairs without
    // ever dropping a qualifying one
    broadcast(p).join(c, col("id_a") =!= col("id_b") &&
        least(size(col("sh_a")), size(col("sh_b"))).cast("double") /
          greatest(size(col("sh_a")), size(col("sh_b"))) >= threshold)
      .withColumn("jaccard", exactJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of the token multiset: bit i of the fingerprint is the
    * sign of Σ_tokens (bit i of xxhash64(token) ? +1 : -1). */
  def simhash64(text: Column): Column = simhash64Tokens(tokens(text))

  def simhash64Tokens(toks: Column): Column =
    (0 until 64).map { i =>
      val bitSum = aggregate(toks, lit(0),
        (acc, t) => acc +
          when(shiftright(xxhash64(t), i).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
      when(bitSum > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming ≤ maxHamming, blocked on 16-bit
    * fingerprint quarters (pigeonhole: ≤3 differing bits leaves at least one
    * of 4 blocks identical, so blocking is lossless for maxHamming ≤ 3). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "16-bit blocking is lossless only up to 3")
    // tokenize once (barrier), then 64 bit-aggregates over the token
    // array; without the barrier the tokenizer is inlined into all 64 exprs
    val withFp = df.select(col(idCol).as("id"),
      tokens(col(textCol)).as("toks"))
      .repartition(defaultParallelism(df))
      .withColumn("fp", simhash64Tokens(col("toks")))
      .drop("toks")
      .repartition(defaultParallelism(df))
    val blocked = withFp.select(col("id"), col("fp"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("fp"), q * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("block_idx", "block_val")))
    val a = blocked.select(col("block_idx"), col("block_val"),
      col("id").as("id_a"), col("fp").as("fp_a"))
    val b = blocked.select(col("block_idx"), col("block_val"),
      col("id").as("id_b"), col("fp").as("fp_b"))
    def block(fp: Column, q: Int): Column =
      shiftright(fp, q * 16).bitwiseAND(lit(0xFFFFL))
    // first-matching-block filter instead of dropDuplicates (see
    // minhashLsh) — dedupe without an extra shuffle
    val firstMatch = (0 until 4).map { q =>
      col("block_idx") === q && (0 until q)
        .map(j => block(col("fp_a"), j) =!= block(col("fp_b"), j))
        .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    a.join(b, Seq("block_idx", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .filter(firstMatch)
      .select(col("id_a"), col("id_b"),
        hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicates: pairs with cosine ≥ threshold.
    * Buckets by random-hyperplane sign signature first (see Similarity) so
    * the self-join is per-bucket, not full O(n²). With `planes = 0` falls
    * back to the exact cross-join (test/oracle path). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 0): DataFrame = {
    // precompute the norm per row (barrier) so the pair scan does one dot
    // product per pair instead of re-deriving both norms every time
    val base = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .repartition(defaultParallelism(df))
    val paired =
      if (planes <= 0)
        base.select(col("id").as("id_a"), col("v").as("v_a"),
          col("nrm").as("n_a"))
          .join(base.select(col("id").as("id_b"), col("v").as("v_b"),
            col("nrm").as("n_b")), col("id_a") < col("id_b"))
      else {
        val withSig = base.withColumn("sig",
          Similarity.hyperplaneSignature(col("v"), planes, dim = 64,
            seed = 7))
        withSig.select(col("sig"), col("id").as("id_a"),
          col("v").as("v_a"), col("nrm").as("n_a"))
          .join(withSig.select(col("sig"), col("id").as("id_b"),
            col("v").as("v_b"), col("nrm").as("n_b")), Seq("sig"))
          .filter(col("id_a") < col("id_b"))
      }
    paired
      .withColumn("cosine",
        when(col("n_a") * col("n_b") === 0, lit(0.0))
          .otherwise(Similarity.dot(col("v_a"), col("v_b")) /
            (col("n_a") * col("n_b"))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
