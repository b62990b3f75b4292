package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup: benchmark decontamination (n-gram overlap against an
  * eval set), Gopher-style repetition signals, overlapping token-window
  * chunking, and deterministic stratified sampling for domain mixing.
  *
  * Scale shapes: the benchmark side of decontamination is broadcast (eval
  * sets are small by construction); the corpus side explodes once
  * (narrow) and aggregates per doc. Repetition signals run ONE explode
  * over a union of tagged gram families and two hash aggregations — not
  * one scan per family. Sampling is a pure filter expression (no shuffle)
  * built on an engine-portable md5-derived uniform, so the same rows are
  * kept by any engine that evaluates the same expression. */
object Curation {

  private def toks(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Token n-grams joined with spaces, IN DOCUMENT ORDER with repeats
    * (unlike Dedup.shingles' distinct set — repetition counting needs the
    * multiplicity). */
  def ngramList(text: Column, n: Int): Column = {
    val t = toks(text)
    val cnt = size(t) - (n - 1)
    // sequence(1, cnt) would DESCEND for cnt < 1 — no grams instead
    when(cnt < 1, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), greatest(cnt, lit(1))),
        i => concat_ws(" ", (0 until n).map(j =>
          element_at(t, (i + j).cast("int"))): _*)))
  }

  // ------------------------------------------------------ decontamination

  /** (id, n_hits): documents sharing at least one normalized token
    * n-gram with any benchmark text; n_hits counts the DISTINCT
    * contaminated grams per document. The benchmark gram set rides a
    * broadcast semi-join, so the corpus side never shuffles its text —
    * the only exchange is the per-doc count aggregation. n = 13 is the
    * classic eval-set decontamination window (GPT-3 appendix C / Llama). */
  def contaminationHits(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    val benchGrams = broadcast(
      bench.select(explode(Dedup.shingles(col(benchTextCol), n)).as("__g"))
        .distinct())
    docs
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("__g"))
      .join(benchGrams, Seq("__g"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The corpus with every contaminated document removed — the frame a
    * training pipeline feeds downstream after an eval-set sweep. */
  def decontaminated(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame =
    docs.join(
      contaminationHits(docs, idCol, textCol, bench, benchTextCol, n)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  // -------------------------------------------------- repetition signals

  /** Per-document repetition quality signals (the Gopher repetition
    * filters, token-based):
    *   - top_2gram_frac:  tokens covered by the most frequent 2-gram
    *     (count × 2 / n_tokens); 0 when the doc has no 2-gram.
    *   - dup_3gram_frac:  fraction of 3-gram INSTANCES whose gram occurs
    *     at least twice in the document.
    *   - dup_chunk_frac:  same, over non-overlapping `chunkWords`-word
    *     chunks (the duplicate-line fraction generalized to chunked text,
    *     like TextAnalysis.scrubBoilerplate).
    * One explode over the tagged union of the three gram families, then
    * a (doc, kind, gram) count and a per-doc conditional rollup — a
    * single source scan and two hash shuffles regardless of family
    * count. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 10): DataFrame = {
    require(chunkWords > 0, "need chunkWords > 0")
    val t = toks(col(textCol))
    def tagged(kind: String, grams: Column): Column =
      transform(grams, g => struct(lit(kind).as("k"), g.as("g")))
    val nChunks = floor((size(t) + lit(chunkWords - 1)) / lit(chunkWords))
      .cast("int")
    val chunks = transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
      c => array_join(slice(t, c * chunkWords + 1, lit(chunkWords)), " "))
    val exploded = df.select(
      col(idCol), size(t).as("__nt"),
      explode(concat(
        tagged("g2", ngramList(col(textCol), 2)),
        tagged("g3", ngramList(col(textCol), 3)),
        tagged("ch", chunks))).as("__kg"))
    val counts = exploded
      .groupBy(col(idCol), col("__nt"),
        col("__kg.k").as("__k"), col("__kg.g").as("__g"))
      .agg(count(lit(1)).as("__c"))
    val c = col("__c")
    def frac(num: Column, den: Column): Column =
      round(when(den.isNull || den === 0, 0.0)
        .otherwise(num.cast("double") / den), 6)
    counts
      .groupBy(col(idCol), col("__nt"))
      .agg(
        max(when(col("__k") === "g2", c)).as("__max2"),
        sum(when(col("__k") === "g3" && c >= 2, c)).as("__dup3"),
        sum(when(col("__k") === "g3", c)).as("__tot3"),
        sum(when(col("__k") === "ch" && c >= 2, c)).as("__dupc"),
        sum(when(col("__k") === "ch", c)).as("__totc"))
      .select(col(idCol),
        frac(coalesce(col("__max2"), lit(0L)) * 2, col("__nt"))
          .as("top_2gram_frac"),
        frac(coalesce(col("__dup3"), lit(0L)), col("__tot3"))
          .as("dup_3gram_frac"),
        frac(coalesce(col("__dupc"), lit(0L)), col("__totc"))
          .as("dup_chunk_frac"))
  }

  // ------------------------------------------------------------ chunking

  /** Split documents into overlapping token windows for training:
    * windows of `maxTokens` starting every `maxTokens − overlap` tokens;
    * the final window may be shorter but every token is covered exactly
    * once by a window start (n_chunks = max(1, ⌈(T − overlap) /
    * stride⌉)). One posexplode — the fan-out is the output size, no
    * shuffle. Emits (id, chunk_idx, chunk_tokens, chunk_text). */
  def chunkForTraining(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val t = toks(col(textCol))
    val nChunks = greatest(
      ceil((size(t) - lit(overlap)).cast("double") / stride).cast("int"),
      lit(1))
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          c => slice(t, c * stride + 1, lit(maxTokens))))
          .as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("__c")).cast("long").as("chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  // ------------------------------------------------------------ sampling

  /** Engine-portable uniform in [0,1) from a key: the first 8 hex chars
    * of md5(key) as a 32-bit integer over 2³². Any SQL engine reproduces
    * the same value, so sampling decisions are deterministic and
    * auditable across engines (unlike rand(seed), whose stream is
    * engine-specific). */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  /** Deterministic stratified sampling for domain mixing: keep a row iff
    * hashUniform(key) < fraction(stratum). Strata absent from the map
    * keep `defaultFraction` (0 drops them). Pure filter expression — no
    * shuffle, pushes past column pruning like any predicate. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(f)).otherwise(acc)
    }
    df.filter(hashUniform(col(keyCol)) < frac)
  }
}
