package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct values fit the capacity") {
    val df = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c"))
      .toDF("v").repartition(8)
    val m = df.agg(FrequentItems.freqItems(col("v"), 16).as("m"))
      .select("m").as[Map[String, Long]].collect().head
    assert(m == Map("a" -> 30L, "b" -> 20L, "c" -> 5L))
  }

  test("under-counts are bounded by n/(capacity+1) and heavy hitters survive") {
    // 1000 rows: one heavy value (400) + 600 distinct singletons
    val rows = Seq.fill(400)("HEAVY") ++ (1 to 600).map(i => s"rare_$i")
    val n = rows.size
    val cap = 9
    val df = rows.toDF("v").repartition(16)
    val m = df.agg(FrequentItems.freqItems(col("v"), cap).as("m"))
      .select("m").as[Map[String, Long]].collect().head
    assert(m.size <= cap)
    // frequency 400 > n/(cap+1) = 100 → guaranteed present
    assert(m.contains("HEAVY"))
    val est = m("HEAVY")
    assert(est <= 400L, s"estimate must not over-count: $est")
    assert(est >= 400L - n / (cap + 1), s"deficit bound violated: $est")
    // every reported count is a valid under-estimate of a true count
    m.foreach { case (k, v) =>
      val truth = if (k == "HEAVY") 400L else 1L
      assert(v <= truth, s"$k over-counted: $v > $truth")
    }
  }

  test("grouped aggregation keeps independent per-group sketches") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(FrequentItems.freqItems(col("v"), 8).as("m"))
      .orderBy("g")
      .select("m").as[Map[String, Long]].collect().toSeq
    assert(out == Seq(Map("x" -> 2L, "y" -> 1L), Map("z" -> 1L)))
  }
}
