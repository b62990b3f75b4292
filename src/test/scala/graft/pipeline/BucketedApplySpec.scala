package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan contract for the end-to-end bucketed curation apply: the
  * registry query's join path must be bucket-pair sort-merge with no
  * shuffle exchange and no sort — the co-location win writeBucketed
  * exists for, pinned on the REAL query, not a fixture. */
class BucketedApplySpec extends SparkSpec {
  import spark.implicits._

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("bucketedApply joins co-bucketed tables with zero Exchange and " +
      "zero Sort; values match the plain-join twin") {
    val corpus = (1L to 300L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text")
    val quality = corpus.select(col("doc_id"),
      (col("doc_id") % 7).cast("double").as("q"))
    val keeps = corpus.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), lit(1L).as("keep"))
    val out = Curation.bucketedApply(corpus.select("doc_id"), "doc_id",
      Seq(("q", quality, "inner"), ("k", keeps, "left")), "bk_spec", 4)
    try {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(countOccurrences(plan, "SortMergeJoin") == 2,
        plan.take(3000))
      // bucket-sorted at write time: the SMJ needs no Sort operator
      assert(!plan.contains("Sort "), plan.take(3000))
      val got = out
        .select(col("doc_id"), col("q"),
          coalesce(col("keep"), lit(0L)).as("keep"))
        .orderBy("doc_id")
        .as[(Long, Double, Long)].collect().toSeq
      val want = (1L to 300L).map(i =>
        (i, (i % 7).toDouble, if (i % 3 == 0) 1L else 0L))
      assert(got == want)
    } finally {
      Seq("bk_spec_corpus", "bk_spec_q", "bk_spec_k")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("the gated q143 plan carries exactly ONE exchange — the final " +
      "presentation sort — and none on the join path") {
    val out = graft.PipelineQueries.q143_bucketed_curate(spark,
      "/root/testdata/sf0.001")
    try {
      val plan = out.queryExecution.executedPlan.toString
      assert(countOccurrences(plan, "Exchange") == 1, plan.take(3000))
      assert(plan.contains("rangepartitioning"), plan.take(3000))
      assert(countOccurrences(plan, "SortMergeJoin") == 2,
        plan.take(3000))
      assert(out.count() > 0)
    } finally {
      Seq("bk143_corpus", "bk143_quality", "bk143_keep")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
