package graft.analysis

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContextSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long): Timestamp = new Timestamp(s * 1000L)

  // rows: ids 1..8 at 10s spacing; ties at t=40 (ids 4 and 5)
  private lazy val rows = Seq(
    (1L, t(10)), (2L, t(20)), (3L, t(30)), (4L, t(40)), (5L, t(40)),
    (6L, t(50)), (7L, t(60)), (8L, t(200))).toDF("rid", "rts")

  test("offsets count stream-order neighbors around each anchor") {
    val anchors = Seq((5L, t(40))).toDF("aid", "ats")
    val out = Context.around(rows, "rts", "rid", anchors, "ats", "aid",
      before = 2, after = 2, maxSpanSec = 100, bucketSeconds = 10)
      .select("aid", "rid", "offset")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._3)
    // stream order: ...3(30), 4(40), [5(40)], 6(50), 7(60)...
    assert(out == Seq((5L, 3L, -2L), (5L, 4L, -1L), (5L, 5L, 0L),
      (5L, 6L, 1L), (5L, 7L, 2L)))
  }

  test("span bound truncates context; far rows never appear") {
    val anchors = Seq((8L, t(200))).toDF("aid", "ats")
    val out = Context.around(rows, "rts", "rid", anchors, "ats", "aid",
      before = 3, after = 3, maxSpanSec = 30, bucketSeconds = 10)
      .select("rid", "offset").as[(Long, Long)].collect().toSeq
    // nothing within ±30s of t=200 except the anchor row itself
    assert(out == Seq((8L, 0L)))
  }

  test("a synthetic anchor (not a row) gets neighbors but no offset-0") {
    val anchors = Seq((99L, t(35))).toDF("aid", "ats")
    val out = Context.around(rows, "rts", "rid", anchors, "ats", "aid",
      before = 2, after = 2, maxSpanSec = 100, bucketSeconds = 10)
      .select("rid", "offset").as[(Long, Long)].collect().toSeq
      .sortBy(_._2)
    assert(out == Seq((2L, -2L), (3L, -1L), (4L, 1L), (5L, 2L)))
  }

  test("multiple anchors rank independently; guards are loud") {
    val anchors = Seq((2L, t(20)), (6L, t(50))).toDF("aid", "ats")
    val out = Context.around(rows, "rts", "rid", anchors, "ats", "aid",
      before = 1, after = 1, maxSpanSec = 100, bucketSeconds = 10)
      .select("aid", "rid", "offset")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((2L, 1L, -1L), (2L, 2L, 0L), (2L, 3L, 1L),
      (6L, 5L, -1L), (6L, 6L, 0L), (6L, 7L, 1L)))
    val e = intercept[IllegalArgumentException] {
      Context.around(rows, "rts", "rid",
        rows.select(col("rid").as("rid2"), col("rts")), "rts", "rid2",
        1, 1, 10)
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
