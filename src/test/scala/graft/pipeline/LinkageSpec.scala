package graft.pipeline

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("linkPairs finds within-block near-matches by edit distance, " +
      "never pairs across blocks, and refuses a hot block loudly") {
    val rows = Seq(
      (1L, "Jonathan Smith"),
      (2L, "Jonathon Smith"),   // dist 1 from #1, same block "jona"
      (3L, "jonathan smyth"),   // dist 1 from #1, dist 2 from #2
      (4L, "Bonathan Smith"),   // 1 edit from #1 but DIFFERENT block
      (5L, "Francesca Rossi"),
      (6L, null.asInstanceOf[String]),
      (7L, "")).toDF("id", "name")
    val out = Linkage.linkPairs(rows, "id", "name", maxDist = 2,
        prefixLen = 4)
      .select("id_a", "id_b", "dist").orderBy("id_a", "id_b")
      .as[(Long, Long, Int)].collect().toSeq
    // blocking is recall-bounded BY DESIGN: #4 is one edit from #1
    // but blocks under "bona" — the documented trade
    assert(out == Seq((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2)))
    val hot = (1L to 50L).map(i => (i, "same prefix " + i))
      .toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      Linkage.linkPairs(hot, "id", "name", maxDist = 1,
        prefixLen = 4, maxBlock = 10)
    }
    assert(e.getMessage.contains("maxBlock"))
  }
}
