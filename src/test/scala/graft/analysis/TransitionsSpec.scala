package graft.analysis

import java.sql.Timestamp

import graft.SparkSpec

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  test("matrix counts adjacent pairs per key in (ts, tie) order, " +
      "conditions probabilities on the from-state, never pairs " +
      "across keys, and drops null states") {
    val rows = Seq(
      // user 1: a → b → a → c
      (1L, t(10), 1L, "a"), (1L, t(20), 2L, "b"),
      (1L, t(30), 3L, "a"), (1L, t(40), 4L, "c"),
      // user 2: a → b (its last event pairs with NOTHING from user 1)
      (2L, t(10), 5L, "a"), (2L, t(20), 6L, "b"),
      // simultaneous events: the id tie-break fixes b → a ordering
      (3L, t(50), 7L, "b"), (3L, t(50), 8L, "a"),
      // null state drops BEFORE the lead, so its neighbors DO become
      // adjacent (the documented contract: a null is not a state)
      (4L, t(10), 9L, "a"), (4L, t(20), 10L, null),
      (4L, t(30), 11L, "c"))
      .toDF("uid", "ts", "eid", "state")
    val out = Transitions.matrix(rows, "uid", "ts", "eid", "state")
      .orderBy("from_state", "to_state")
      .as[(String, String, Long, Double)].collect().toSeq
    // pairs: u1 a→b, b→a, a→c; u2 a→b; u3 b→a; u4 a→c (null dropped,
    // so a and c become adjacent — the documented contract)
    assert(out == Seq(
      ("a", "b", 2L, 0.5),   // from a: 2 of 4
      ("a", "c", 2L, 0.5),
      ("b", "a", 2L, 1.0)))
  }
}
