package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("resolves roots and depths across a forest") {
    // two trees: 1→(2,3), 2→4; 10→11; plus a dangling parent (20→99,
    // 99 absent) which makes 20 a truncated root
    val nodes = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(1L)), (4L, Some(2L)),
      (10L, None), (11L, Some(10L)), (20L, Some(99L)))
      .toDF("id", "parent")
    val r = Hierarchy.resolve(nodes).orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 2L),
      (10L, 10L, 0L), (11L, 10L, 1L), (20L, 20L, 0L)))
  }

  test("pointer doubling resolves a deep chain in log rounds") {
    // chain 0←1←2←…←63: depth 63 must resolve within 7 doubling rounds
    val nodes = (0L to 63L)
      .map(i => (i, if (i == 0) None else Some(i - 1)))
      .toDF("id", "parent")
    val r = Hierarchy.resolve(nodes, maxRounds = 7)
    assert(r.agg(max("depth")).as[Long].collect().head == 63L)
    assert(r.filter(col("root") =!= 0L).count() == 0L)
  }

  test("cycles fail loudly instead of returning a partial frame") {
    val nodes = Seq((1L, Some(2L)), (2L, Some(1L)), (3L, None))
      .toDF("id", "parent")
    val e = intercept[IllegalStateException] {
      Hierarchy.resolve(nodes, maxRounds = 4).collect()
    }
    assert(e.getMessage.contains("cycle"))
  }
}
