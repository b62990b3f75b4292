package graft.pipeline

import graft.SparkSpec

/** Exact-substring dedup (Lee et al. ExactSubstr semantics): duplicated
  * >= k-token regions are removed from every occurrence except the first
  * in (id, pos) order. Cases are hand-derived. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def w(n: Int, p: String) = (1 to n).map(p + _).mkString(" ")

  test("a full copy loses everything; the original keeps everything") {
    val orig = w(12, "a")
    val df = Seq((1L, orig), (2L, orig)).toDF("id", "text")
    val out = Dedup.removeRepeatedSubstrings(df, "id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == orig && out(1L).getLong(2) == 0)
    assert(out(2L).getString(1) == "" && out(2L).getLong(3) == 12 &&
      out(2L).getLong(4) == 0)
  }

  test("an embedded copied region is excised; flanks survive") {
    val copied = w(8, "x")
    val df = Seq(
      (1L, copied),
      (2L, s"pre1 pre2 $copied post1 post2 post3")).toDF("id", "text")
    val out = Dedup.removeRepeatedSubstrings(df, "id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getString(1) == "pre1 pre2 post1 post2 post3")
    assert(out(2L).getLong(2) == 1 && out(2L).getLong(3) == 8)
  }

  test("within-doc repetition keeps only the first period") {
    // 10 tokens repeated twice: gram at pos 10 duplicates pos 0; the
    // cross-boundary grams (pos 1..9) are unique, so exactly [10, 20) goes
    val df = Seq((7L, w(10, "t") + " " + w(10, "t"))).toDF("id", "text")
    val out = Dedup.removeRepeatedSubstrings(df, "id", "text", k = 10)
      .collect().head
    assert(out.getString(1) == w(10, "t"))
    assert(out.getLong(3) == 10 && out.getLong(4) == 10)
  }

  test("disjoint duplicated regions merge into separate spans") {
    val a = w(6, "a"); val b = w(6, "b")
    val df = Seq(
      (1L, a), (2L, b),
      (3L, s"$a m1 m2 m3 $b")).toDF("id", "text")
    val spans = Dedup.duplicateSpans(df, "id", "text", k = 5)
      .filter($"id" === 3L).orderBy("span_start")
      .as[(Long, Long, Long)].collect()
    assert(spans.toSeq == Seq((3L, 0L, 6L), (3L, 9L, 15L)))
    val out = Dedup.removeRepeatedSubstrings(df, "id", "text", k = 5)
      .filter($"id" === 3L).collect().head
    assert(out.getString(1) == "m1 m2 m3" && out.getLong(2) == 2)
  }

  test("near-misses and short texts pass through untouched") {
    val df = Seq(
      (1L, "u1 u2 u3 u4 u5 u6"),
      (2L, "u1 u2 u3 u4 X u6"), // shares only a 4-token run < k=5
      (3L, "s1 s2")) // shorter than k: no grams at all
      .toDF("id", "text")
    val out = Dedup.removeRepeatedSubstrings(df, "id", "text", k = 5)
      .collect()
    assert(out.forall(r => r.getLong(2) == 0 && r.getLong(3) == 0))
    assert(Dedup.duplicateSpans(df, "id", "text", k = 5).count() == 0)
  }

  test("three-way copies: both later occurrences are removed") {
    val t = w(7, "z")
    val df = Seq((5L, t), (6L, t), (9L, t)).toDF("id", "text")
    val out = Dedup.removeRepeatedSubstrings(df, "id", "text", k = 7)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(5L) == t && out(6L) == "" && out(9L) == "")
  }
}
