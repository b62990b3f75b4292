package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Jensen–Shannon divergence between per-group unigram language models
  * and the corpus mixture — the information-theoretic "how far is this
  * SOURCE's vocabulary from the blend?" read that complements
  * [[Concentration.gini]] (weight inequality) and
  * [[graft.pipeline.TextAnalysis.vocabOverlap]] (set Jaccard): JSD is
  * bounded in [0, ln 2], symmetric, and weighs terms by probability
  * mass rather than vocabulary membership, so one hot boilerplate term
  * moves it where a million hapaxes don't.
  *
  * JSD(P‖Q) = ½ Σ p·ln(p/m) + ½ Σ q·ln(q/m) with m = (p+q)/2. The
  * engine emits per-(group, term) CELLS carrying each term's
  * contribution (the charEntropyCells convention): every cell value is
  * one IEEE expression over exact longs, so independent engines agree
  * bit-for-bit, and the group's JSD is the downstream sum — no
  * cross-row float fold decides a gated value.
  *
  * The term axis is the corpus-wide top-`topK` words (count-desc,
  * lexicographic tiebreak) plus one `__other__` bucket holding the
  * tail — the bounded-support projection that makes JSD comparable
  * across snapshots (an unbounded support would let vocabulary churn
  * masquerade as drift). Tokens = whitespace split of the lowercased
  * text (the Bpe.wordFrequencies spelling).
  *
  * Scale shape: a (group, word) hash aggregate with map-side combine
  * (computed by the vocab and fold branches — each pass is one
  * map-combined shuffle of cell-sized rows), a broadcast of the ≤topK
  * vocab for the tail fold, and a groups×(topK+1) cell frame for the
  * final expressions — everything after the word aggregate is
  * vocabulary-sized.
  */
object Divergence {

  /** Per-(group, term) JSD contribution cells: group, term (or
    * `__other__`), `n` (group count), `p`/`q` (group / corpus
    * probability, 6dp), `jsd_term` (6dp). Σ jsd_term over a group =
    * JSD(group ‖ corpus) — [[jsd]] does exactly that. Zero-count
    * (group, term) cells ARE emitted (q > 0 contributes mass). */
  def jsdCells(df: DataFrame, groupCol: String, textCol: String,
      topK: Int = 32): DataFrame =
    cells0(df, groupCol, textCol, topK)
      .select(col(groupCol), col("term"), col("n"),
        round(col("__p"), 6).as("p"), round(col("__q"), 6).as("q"),
        round(col("__t"), 6).as("jsd_term"))

  private def cells0(df: DataFrame, groupCol: String, textCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val words = df
      .filter(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(filter(split(trim(lower(col(textCol))), "\\s+"),
          t => t =!= "")).as("w"))
    // counts is read by two branches (vocab, folded); both are
    // map-side-combined hash aggregates over the same shuffle, and a
    // persist here can't be released before the caller evaluates the
    // returned lazy frame — recomputing the cheap agg beats leaking a
    // cache entry for the session's lifetime
    val counts = words.groupBy(col("g"), col("w"))
      .agg(count(lit(1)).as("n"))
    val vocab = counts.groupBy(col("w"))
      .agg(sum(col("n")).as("cn"))
      .orderBy(desc("cn"), asc("w"))
      .limit(topK)
      .select(col("w"), lit(true).as("__kept"))
    // fold tail words into __other__ BEFORE re-aggregating: the cell
    // frame stays groups × (topK + 1)
    val folded = counts
      .join(broadcast(vocab), Seq("w"), "left")
      .select(col("g"),
        when(col("__kept"), col("w")).otherwise(lit("__other__"))
          .as("term"),
        col("n"))
      .groupBy(col("g"), col("term"))
      .agg(sum(col("n")).as("n"))
    val corpus = folded.groupBy(col("term"))
      .agg(sum(col("n")).as("qn"))
    val groupTot = folded.groupBy(col("g")).agg(sum(col("n")).as("gt"))
    val grand = corpus.agg(sum(col("qn")).as("tt"))
    // dense support: every (group, term) cell exists, zero-count
    // included — groups × (topK+1) rows, a driver-safe frame
    val dense = groupTot.crossJoin(corpus.crossJoin(grand))
      .join(folded, Seq("g", "term"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val p = col("n").cast("double") / col("gt")
    val q = col("qn").cast("double") / col("tt")
    val m = (p + q) / 2.0
    // p = 0 ⇒ its ln term is 0 by the 0·ln 0 = 0 convention; q > 0
    // always (the term exists corpus-wide by construction)
    val term =
      when(col("n") === 0, lit(0.5) * q * log(q / m))
        .otherwise(lit(0.5) * p * log(p / m) + lit(0.5) * q * log(q / m))
    dense.select(col("g").as(groupCol), col("term"),
      col("n"), p.as("__p"), q.as("__q"), term.as("__t"))
  }

  /** Per-group JSD(group ‖ corpus) in nats: the summed UNROUNDED cells
    * (rounding before the fold would bias the sum), plus the
    * normalized `jsd_norm` = jsd / ln 2 in [0, 1]. The sum is a float
    * fold over topK+1 cells — spec-gated; gate the CELLS when an
    * independent engine must agree bit-for-bit. */
  def jsd(df: DataFrame, groupCol: String, textCol: String,
      topK: Int = 32): DataFrame =
    cells0(df, groupCol, textCol, topK)
      .groupBy(col(groupCol))
      .agg(round(sum(col("__t")), 6).as("jsd"),
        round(sum(col("__t")) / math.log(2.0), 6).as("jsd_norm"))
}
