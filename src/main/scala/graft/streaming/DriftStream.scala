package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous categorical drift against a pinned reference mix — the
  * streaming twin of [[graft.analysis.Drift.categoricalDrift]]: per
  * tumbling window, the live category distribution scores its KL and
  * chi-square terms against a BATCH-computed reference histogram
  * (train the reference once with the batch operator, monitor forever
  * here — the "is the crawl mix shifting right now" alarm feed).
  *
  * ONE stateful operator: the reference's category set is known
  * statically, so per-window counts are a fixed-width conditional
  * aggregate (one `sum(when(key = c, 1))` per reference category plus
  * one `__other` cell for categories the reference never saw (null
  * keys included) — the
  * appearance of which is itself the drift signal). The per-category
  * drift terms are stateless projection after the aggregate, restored
  * to rows by posexplode over the literal category array — never a
  * second (chained, unsupported) stateful aggregation for totals.
  * State per open window is one row of |categories|+2 longs,
  * independent of event volume.
  *
  * Smoothing follows the batch twin (add-c over the union category
  * set, K = |reference| + 1 for the other-cell), so a window whose
  * mix matches the reference scores ~0 and the terms stay finite when
  * a category appears on one side only. */
object DriftStream {

  /** Append-mode frame: one row per (window_start, category) —
    * `n_cur`, smoothed `p_ref`/`p_cur`, `kl_term`, `chi2_term` (6dp,
    * the batch twin's spelling). `reference` is category → count from
    * the batch corpus; `__other` aggregates every unseen category. */
  def categoricalDrift(stream: DataFrame, tsCol: String,
      keyCol: String, reference: Map[String, Long],
      windowSeconds: Long, smooth: Double = 0.5,
      latenessSeconds: Long = 0L): DataFrame = {
    require(reference.nonEmpty, "reference histogram must be non-empty")
    require(!reference.contains("__other"),
      "reference must not contain the reserved __other category")
    require(smooth > 0.0, "smoothing constant must be positive")
    require(windowSeconds > 0, "window must be positive")
    val cats = reference.keys.toSeq.sorted
    val refTotal = reference.values.sum
    val k = cats.length + 1 // union set: reference categories + other
    // one conditional-count cell per reference category (index-named —
    // a category string is data, not a safe identifier), plus other.
    // NULL keys route to __other via null-safe conditions: with plain
    // === / isin they would count in __tc but in NO cell, silently
    // inflating every denominator (the batch twin gives null its own
    // row; here "key the reference never saw" covers null too)
    val cells = cats.zipWithIndex.map { case (c, i) =>
      sum(when(col(keyCol) <=> c, 1L).otherwise(0L)).as(s"__c_$i") } :+
      sum(when(col(keyCol).isNull ||
        !col(keyCol).isin(cats: _*), 1L).otherwise(0L))
        .as("__c_oth") :+
      count(lit(1)).as("__tc")
    val agged = stream
      .withWatermark(tsCol, s"$latenessSeconds seconds")
      .groupBy(window(col(tsCol), s"$windowSeconds seconds"))
      .agg(cells.head, cells.tail: _*)
    // stateless projection: explode the literal category list, pick
    // each category's count cell by position, then the batch twin's
    // smoothing/terms math
    val catArr = array((cats :+ "__other").map(lit): _*)
    val cntArr = array((cats.indices.map(i => col(s"__c_$i")) :+
      col("__c_oth")): _*)
    val nRef = element_at(
      typedLit(reference + ("__other" -> 0L)), col("category"))
    val pRef = (nRef + lit(smooth)) /
      (lit(refTotal.toDouble) + lit(smooth) * lit(k.toDouble))
    val pCur = (col("n_cur") + lit(smooth)) /
      (col("__tc") + lit(smooth) * lit(k.toDouble))
    agged
      .select(col("window.start").as("window_start"), col("__tc"),
        cntArr.as("__cnts"),
        posexplode(catArr).as(Seq("__i", "category")))
      .withColumn("n_cur",
        element_at(col("__cnts"), col("__i") + 1).cast("long"))
      .withColumn("p_ref", pRef)
      .withColumn("p_cur", pCur)
      .withColumn("kl_term",
        round(col("p_cur") * log(col("p_cur") / col("p_ref")), 6))
      .withColumn("chi2_term", round(
        pow(col("n_cur") - col("__tc") * col("p_ref"), 2) /
          (col("__tc") * col("p_ref")), 6))
      .select("window_start", "category", "n_cur",
        "p_ref", "p_cur", "kl_term", "chi2_term")
      .withColumn("p_ref", round(col("p_ref"), 6))
      .withColumn("p_cur", round(col("p_cur"), 6))
  }

  /** Continuous NUMERIC drift against a pinned reference histogram —
    * the streaming twin of [[graft.analysis.Drift.psiDrift]]: per
    * tumbling window, the live value distribution scores per-bin PSI
    * terms against a batch-computed reference (same equal-width bins
    * from the reference [lo, hi] range, same clamping, same add-c
    * smoothing), so the batch profile trains once and the stream
    * monitors forever.
    *
    * Same shape as [[categoricalDrift]]: fixed-width conditional
    * bin-count cells per window (state = `refCounts.length` + 1 longs
    * per open window, volume-independent), stateless term projection
    * restored to rows by posexplode. Null values are dropped like the
    * batch twin (an ECDF has no place for them). */
  def numericDrift(stream: DataFrame, tsCol: String, valueCol: String,
      lo: Double, hi: Double, refCounts: Seq[Long],
      windowSeconds: Long, smooth: Double = 0.5,
      latenessSeconds: Long = 0L): DataFrame = {
    require(refCounts.nonEmpty, "reference histogram must be non-empty")
    require(refCounts.forall(_ >= 0L),
      "reference counts must be non-negative")
    require(hi > lo, "reference range must have width (hi > lo)")
    require(smooth > 0.0, "smoothing constant must be positive")
    require(windowSeconds > 0, "window must be positive")
    val bins = refCounts.length
    val refTotal = refCounts.sum
    val v = col(valueCol).cast("double")
    // the batch twin's bin expression: clamp BEFORE the int cast (a
    // corrupted huge value would wrap the cast with ANSI off and land
    // in an arbitrary bin instead of the edge), computed ONCE per row
    // — Catalyst does not CSE across independent aggregate cells
    val bin = least(lit(bins - 1L), greatest(lit(0L),
      floor((v - lit(lo)) * bins / lit(hi - lo)))).cast("int")
    val cells = (0 until bins).map(i =>
      sum(when(col("__bin") === i, 1L).otherwise(0L))
        .as(s"__c_$i")) :+
      sum(when(col("__bin").isNotNull, 1L).otherwise(0L)).as("__tc")
    val agged = stream
      .withWatermark(tsCol, s"$latenessSeconds seconds")
      .withColumn("__bin", when(v.isNotNull, bin))
      .groupBy(window(col(tsCol), s"$windowSeconds seconds"))
      .agg(cells.head, cells.tail: _*)
    val refArr = typedLit(refCounts)
    val cntArr = array((0 until bins).map(i => col(s"__c_$i")): _*)
    val pRef = (col("n_ref") + lit(smooth)) /
      (lit(refTotal.toDouble) + lit(smooth * bins))
    val pCur = (col("n_cur") + lit(smooth)) /
      (col("__tc") + lit(smooth * bins))
    agged
      .select(col("window.start").as("window_start"), col("__tc"),
        posexplode(cntArr).as(Seq("bin", "n_cur")))
      .withColumn("n_ref", element_at(refArr, col("bin") + 1))
      // the batch twin's full-outer alignment materializes only
      // OBSERVED bins: a bin empty on BOTH sides emits no row there,
      // so it emits none here either (its smoothed term is alignment
      // noise, not signal)
      .filter(col("n_ref") > 0 || col("n_cur") > 0)
      .withColumn("__p", pRef)
      .withColumn("__q", pCur)
      .withColumn("psi_term",
        round((col("__q") - col("__p")) * log(col("__q") / col("__p")),
          6))
      .select(col("window_start"), col("bin"), col("n_ref"),
        col("n_cur"), round(col("__p"), 6).as("p_ref"),
        round(col("__q"), 6).as("p_cur"), col("psi_term"))
  }
}
