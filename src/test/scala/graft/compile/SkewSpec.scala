package graft.compile

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 900 of 1000 rows share one key
  private lazy val big = (0 until 1000)
    .map(i => (if (i < 900) "hot" else s"k${i % 7}", i.toLong, i * 0.5))
    .toDF("svc", "id", "v")
  private lazy val dims = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"))
    .toDF("svc", "label")

  test("salted join equals the plain inner join") {
    val plain = big.join(dims, Seq("svc"))
      .select("svc", "id", "v", "label")
      .orderBy("svc", "id").collect().toSeq
    val salted = Skew.saltedJoin(big, dims, Seq("svc"), salt = 8)
      .select("svc", "id", "v", "label")
      .orderBy("svc", "id").collect().toSeq
    assert(salted == plain)
    assert(salted.count(_.getString(0) == "hot") == 900)
  }

  test("salted two-stage aggregation equals the direct aggregation") {
    import org.apache.spark.sql.functions._
    val direct = big.groupBy("svc")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum"),
        min("v").as("min"), max("v").as("max"))
      .orderBy("svc")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val salted = Skew.saltedSumCount(big, Seq("svc"), "v", salt = 8)
      .orderBy("svc")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(salted == direct)
  }
}
