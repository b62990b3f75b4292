package graft.analysis

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private val left = Seq(
    (1L, "a", t(10)),
    (2L, "a", t(20)),
    (3L, "a", t(5)),
    (4L, "b", t(30)),
    (5L, "c", t(10))) // key with no right rows
    .toDF("id", "k", "ts")

  private val right = Seq(
    ("a", t(8), 1.0),
    ("a", t(20), 2.0), // exact tie with left id=2 → inclusive match
    ("a", t(21), 9.0),
    ("b", t(1), 7.0))
    .toDF("k", "ts", "v")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id")
      .select("id", "right_v")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSeq

  test("backward: latest right at-or-before, per key, left outer") {
    val out = AsOfJoin.backward(left, right, "ts", Seq("k"))
    assert(out.columns.toSeq ==
      Seq("id", "k", "ts", "right_ts", "right_v"))
    assert(rows(out) == Seq(
      1L -> Some(1.0), // t10 → right t8
      2L -> Some(2.0), // t20 → right t20 (inclusive), not t21
      3L -> None, // t5 predates all right rows for a
      4L -> Some(7.0), // b: t30 → t1
      5L -> None)) // c: no right rows at all
    // matched right timestamp is attached
    val rt = out.filter($"id" === 1).select("right_ts")
      .as[Timestamp].collect().head
    assert(rt == t(8))
  }

  test("tolerance nulls stale matches but keeps the left row") {
    val out = AsOfJoin.backward(left, right, "ts", Seq("k"),
      tolerance = Some(600L)) // 10 minutes
    assert(rows(out) == Seq(
      1L -> Some(1.0), // 2 min stale
      2L -> Some(2.0), // 0 stale
      3L -> None,
      4L -> None, // b: 29 min stale > 10 min
      5L -> None))
  }

  test("equal-time right duplicates resolve to the greatest payload") {
    val dup = right.unionByName(
      Seq(("a", t(8), 0.5)).toDF("k", "ts", "v"))
    val out = AsOfJoin.backward(left, dup, "ts", Seq("k"))
    // id=1 at t10 sees two right rows at t8: deterministic max payload
    assert(rows(out).toMap.apply(1L) == Some(1.0))
  }
}
