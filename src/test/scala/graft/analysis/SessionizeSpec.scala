package graft.analysis

import java.sql.Timestamp

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private val events = Seq(
    ("a", t("2024-01-01 00:00:00")),
    ("a", t("2024-01-01 00:10:00")), // 10 min gap → same session
    ("a", t("2024-01-01 01:00:00")), // 50 min gap → new session
    ("a", t("2024-01-01 01:00:00")), // exact tie → same session
    ("b", t("2024-01-01 00:00:00"))) // other key independent
    .toDF("k", "ts")

  test("byGap assigns per-key session ordinals across gaps and ties") {
    val out = Sessionize.byGap(events, "ts", Seq("k"), 1800.0)
      .select("k", "ts", "session_id")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      ("a", t("2024-01-01 00:00:00"), 1L),
      ("a", t("2024-01-01 00:10:00"), 1L),
      ("a", t("2024-01-01 01:00:00"), 2L),
      ("b", t("2024-01-01 00:00:00"), 1L)))
    // the tie rows both landed in session 2 (Set collapsed them)
    val full = Sessionize.byGap(events, "ts", Seq("k"), 1800.0)
      .filter($"k" === "a" && $"session_id" === 2L).count()
    assert(full == 2L)
  }

  test("sessions aggregates start/end/events per session") {
    val out = Sessionize.sessions(events, "ts", Seq("k"), 1800.0)
      .orderBy("k", "session_start")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3)))
      .toSeq
    assert(out == Seq(
      ("a", t("2024-01-01 00:00:00"), t("2024-01-01 00:10:00"), 2L),
      ("a", t("2024-01-01 01:00:00"), t("2024-01-01 01:00:00"), 2L),
      ("b", t("2024-01-01 00:00:00"), t("2024-01-01 00:00:00"), 1L)))
  }

  test("a gap exactly at the timeout stays in-session") {
    val edge = Seq(
      ("a", t("2024-01-01 00:00:00")),
      ("a", t("2024-01-01 00:30:00"))).toDF("k", "ts")
    val n = Sessionize.sessions(edge, "ts", Seq("k"), 1800.0).count()
    assert(n == 1L)
  }
}
