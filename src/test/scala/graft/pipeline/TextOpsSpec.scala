package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 text operators: script mix, NFC normalization, Luhn card
  * scan, sentence stats, character-entropy cells, vocabulary
  * overlap. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("scriptMix counts each Unicode block and fractions sum over " +
      "classified chars; all-space text answers zero fractions") {
    val df = Seq(
      (1L, "abc де 中文 77 x"),     // 4 latin, 2 cyr, 2 cjk, 2 digit
      (2L, "   "),
      (3L, "αβγ")                    // greek only
    ).toDF("id", "text")
    val out = TextAnalysis.scriptMix(df, "id", "text")
      .orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getAs[Int]("n_chars_ns") == 10)
    assert(r1.getAs[Int]("n_latin") == 4)
    assert(r1.getAs[Int]("n_cyrillic") == 2)
    assert(r1.getAs[Int]("n_cjk") == 2)
    assert(r1.getAs[Int]("n_digit") == 2)
    assert(r1.getAs[Int]("n_other") == 0)
    assert(r1.getAs[Double]("f_latin") == 0.4)
    val r2 = out(1)
    assert(r2.getAs[Int]("n_chars_ns") == 0 &&
      r2.getAs[Double]("f_latin") == 0.0)
    assert(out(2).getAs[Int]("n_greek") == 3)
  }

  test("normalizeText: NFC recomposes decomposed accents, whitespace " +
      "collapses, control bytes strip, clean text reports unchanged, " +
      "null text answers nulls") {
    val df = Seq(
      (1L, " café\t\t x "),
      (2L, "already clean"),
      (3L, null: String)).toDF("id", "text")
    val out = TextAnalysis.normalizeText(df, "id", "text")
      .orderBy("id").collect()
    assert(out(0).getString(1) == "café x")
    assert(out(0).getLong(2) == 1L)
    assert(out(0).getLong(3) == 12L && out(0).getLong(4) == 6L)
    assert(out(1).getString(1) == "already clean" &&
      out(1).getLong(2) == 0L)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("luhnScan: checksum separates a valid PAN from its corrupted " +
      "twin; short runs and non-digits are not candidates") {
    val df = Seq(
      (1L, "pay 4532015112830366 now"),       // valid (verified)
      (2L, "pay 4532015112830367 now"),       // corrupt last digit
      (3L, "order 12345 and 374245455400126"), // 5-digit run ignored
      (4L, "no numbers at all")).toDF("id", "text")
    val out = TextAnalysis.luhnScan(df, "id", "text")
      .orderBy("id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(out == Seq((1L, 1, 1), (2L, 1, 0), (3L, 1, 1), (4L, 0, 0)))
  }

  test("tokenizerFertility: hand-computed tokens/words and " +
      "chars/token per group; null text excluded") {
    val df = Seq(
      // "don't stop" → words 2; bpe-ish: don ' t stop = 4 → 2.0
      (1L, "en", "don't stop"),
      // "abc 123" → words 2; tokens: abc, 123 = 2 → 1.0
      (2L, "de", "abc 123"),
      (3L, "de", null.asInstanceOf[String]))
      .toDF("id", "lang", "text")
    val out = TextAnalysis.tokenizerFertility(df, "lang", "text")
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(out == Seq(
      ("de", 1L, 2L, 2L, 7L, 1.0, 3.5),
      ("en", 1L, 2L, 4L, 10L, 2.0, 2.5)))
  }

  test("piiCensus counts each family independently on the raw text; " +
      "null text answers zeros, not nulls") {
    val df = Seq(
      (1L, "mail a@b.co and c@d.org, server 10.0.0.7, +1 555 0100"),
      (2L, "clean prose with a version 1.2.3 and year 2024"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val out = TextAnalysis.piiCensus(df, "id", "text")
      .orderBy("id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 1L, true),
      (2L, 0L, 0L, 0L, false),  // 1.2.3 is not an IPv4; 2024 no phone
      (3L, 0L, 0L, 0L, false)))
  }

  test("luhnScan: a digit blob longer than 19 is NOT a candidate — " +
      "maximal-run boundaries, not a greedy 19-digit prefix") {
    val df = Seq(
      // 24-digit decimal id: the unguarded regex would take its
      // 19-digit prefix as a candidate
      (1L, "id 453201511283036645320151 end"),
      // a valid PAN embedded in a longer digit run is also not a PAN
      (2L, "blob 94532015112830366 end"),
      // the same PAN properly delimited still hits
      (3L, "pan 4532015112830366 end")).toDF("id", "text")
    val out = TextAnalysis.luhnScan(df, "id", "text")
      .orderBy("id")
      .as[(Long, Int, Int)].collect().toSeq
    assert(out == Seq((1L, 0, 0), (2L, 1, 0), (3L, 1, 1)))
  }

  test("sentenceStats: terminal-punctuation runs split, fragments " +
      "drop, unpunctuated text is one sentence, mean/max are exact") {
    val df = Seq(
      (1L, "one two three. four five! six?? "),
      (2L, "just four words here"),
      (3L, "...")).toDF("id", "text")
    val out = TextAnalysis.sentenceStats(df, "id", "text")
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 3 && out(0).getInt(2) == 6)
    assert(out(0).getDouble(3) == 2.0 && out(0).getInt(4) == 3)
    assert(out(1).getInt(1) == 1 && out(1).getInt(4) == 4)
    assert(out(2).isNullAt(1)) // punctuation-only: zero sentences
  }

  test("charEntropyCells: four equally frequent chars give p=0.25 " +
      "and terms summing to 2 bits; spaces never form cells") {
    val df = Seq((1L, "ab cd ab cd")).toDF("id", "text")
    val out = TextAnalysis.charEntropyCells(df, "id", "text")
      .orderBy("ch").collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Double]("p") == 0.25))
    assert(math.abs(out.map(_.getAs[Double]("entropy_term")).sum
      - 2.0) < 1e-9)
  }

  test("vocabOverlap: identical vocabularies give jaccard 1, partial " +
      "overlap is exact, disjoint pairs emit no row") {
    val df = Seq(
      ("s1", "alpha beta gamma"),
      ("s2", "alpha beta gamma"),
      ("s3", "alpha delta"),
      ("s4", "zzz qqq")).toDF("src", "text")
    val out = TextAnalysis.vocabOverlap(df, "src", "text")
      .orderBy("ga", "gb")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out.contains(("s1", "s2", 3L, 3L, 3L, 1.0)))
    assert(out.contains(("s1", "s3", 3L, 2L, 1L, 0.25)))
    // s4 shares nothing: absent from every pair row
    assert(!out.exists(r => r._1 == "s4" || r._2 == "s4"))
  }

  test("oovRate: tokens absent from the reference vocabulary count " +
      "as OOV, known tokens don't, rates are exact") {
    val ref = Seq(("r", "alpha beta gamma")).toDF("id", "text")
    val batch = Seq(
      (1L, "alpha beta zzz qqq"),   // 2 of 4 OOV
      (2L, "alpha beta gamma"),     // all known
      (3L, "novel words only")      // all OOV
    ).toDF("id", "text")
    val out = TextAnalysis.oovRate(batch, ref, "id", "text")
      .orderBy("id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 4L, 2L, 0.5), (2L, 3L, 0L, 0.0),
      (3L, 3L, 3L, 1.0)))
  }

  test("topTerms ranks by the integer-only (tf desc, df asc, term) " +
      "key — rarer terms win tf ties — and caps at k") {
    val df = Seq(
      (1L, "apple apple banana cherry"),  // tf: apple 2; b/c tie at 1
      (2L, "banana banana banana date")   // banana df=2, cherry df=1
    ).toDF("id", "text")
    val out = TextAnalysis.topTerms(df, "id", "text", k = 2)
      .orderBy("id", "rank")
      .select("id", "rank", "term")
      .as[(Long, Int, String)].collect().toSeq
    // doc 1: apple (tf 2) first; then cherry beats banana on df
    // (cherry df=1 < banana df=2) despite the tf tie
    assert(out == Seq((1L, 1, "apple"), (1L, 2, "cherry"),
      (2L, 1, "banana"), (2L, 2, "date")))
  }

  test("hapaxRatio: once-seen vocabulary fraction is exact per " +
      "group; templated text scores low, all-unique text scores 1") {
    val df = Seq(
      ("tpl", "spam spam spam ham ham eggs"),  // hapax: eggs → 1/3
      ("uni", "all words here differ")          // 4/4
    ).toDF("src", "text")
    val out = TextAnalysis.hapaxRatio(df, "src", "text")
      .orderBy("g")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("tpl", 3L, 6L, 1L, 0.333333),
      ("uni", 4L, 4L, 4L, 1.0)))
  }

  test("compressionRatio: repetitive text compresses far below " +
      "prose, random-ish text compresses worst, deterministic " +
      "across calls, null/empty answer nulls") {
    val rep = ("spam " * 200).trim
    val prose = (1 to 100).map(i => s"word$i item$i").mkString(" ")
    val df = Seq((1L, rep), (2L, prose), (3L, null: String),
      (4L, "")).toDF("id", "text")
    val out = TextAnalysis.compressionRatio(df, "id", "text")
      .orderBy("id").collect()
    val r1 = out(0).getAs[Double]("compression_ratio")
    val r2 = out(1).getAs[Double]("compression_ratio")
    assert(r1 < 0.05 && r1 < r2 && r2 < 1.0)
    assert(out(2).isNullAt(1) && out(3).isNullAt(1))
    val again = TextAnalysis.compressionRatio(df, "id", "text")
      .orderBy("id").collect()
    assert(again(0).getAs[Double]("compression_ratio") == r1)
    assert(out(0).getAs[Long]("raw_bytes") == rep.length.toLong)
  }
}
