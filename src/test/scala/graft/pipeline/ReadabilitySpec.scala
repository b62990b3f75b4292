package graft.pipeline

import graft.SparkSpec

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("readability counts words/sentences/vowel-group syllables and " +
      "scores the Flesch formula; fragments floor at one sentence; " +
      "null and empty text answer nulls") {
    val rows = Seq(
      (1L, Some("The cat sat. The dog ran!")),
      (2L, Some("no terminal punctuation here")),
      (3L, Some("")),
      (4L, Option.empty[String])).toDF("doc_id", "text")
    val out = TextAnalysis.readability(rows, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getInt(r1.fieldIndex("n_words")) == 6)
    assert(r1.getInt(r1.fieldIndex("n_sentences")) == 2)
    // vowel groups: e,a,a,e,o,a = 6
    assert(r1.getInt(r1.fieldIndex("n_syllables")) == 6)
    val flesch = 206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6)
    assert(math.abs(r1.getDouble(r1.fieldIndex("flesch")) -
      math.rint(flesch * 1e6) / 1e6) < 1e-9)
    val r2 = out(1)
    assert(r2.getInt(r2.fieldIndex("n_sentences")) == 1) // floor
    assert(out(2).isNullAt(out(2).fieldIndex("flesch")))
    assert(out(3).isNullAt(out(3).fieldIndex("n_words")))
    // monotonicity sanity: longer words/sentences read harder
    val pair = Seq(
      (1L, "See the cat. It is fun. We run now. Go play ball."),
      (2L, "Extraordinarily convoluted administrative infrastructure " +
        "necessitates comprehensive organizational restructuring " +
        "initiatives immediately."))
      .toDF("doc_id", "text")
    val p = TextAnalysis.readability(pair, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(p(0).getDouble(p(0).fieldIndex("flesch")) >
      p(1).getDouble(p(1).fieldIndex("flesch")) + 50)
  }
}
