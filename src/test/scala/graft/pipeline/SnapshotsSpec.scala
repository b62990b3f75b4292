package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged and " +
      "distinguishes null from empty content") {
    val prev = Seq(
      (1L, Some("alpha")), (2L, Some("beta")), (3L, Some("gamma")),
      (4L, Option.empty[String])).toDF("id", "text")
    val curr = Seq(
      (1L, Some("alpha")),          // unchanged
      (2L, Some("beta v2")),        // changed
      (4L, Some("")),               // null → empty IS a change
      (5L, Some("delta")))          // added; 3 removed
      .toDF("id", "text")
    val out = Snapshots.snapshotDiff(prev, curr, "id", Seq("text"))
      .orderBy("id")
      .select("id", "status").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "changed"), (5L, "added")))
    // multi-column identity: ("a","b") vs ("ab","") must differ —
    // fixed-width per-column digests keep column boundaries
    val p2 = Seq((1L, "a", "b")).toDF("id", "c1", "c2")
    val c2 = Seq((1L, "ab", "")).toDF("id", "c1", "c2")
    val d2 = Snapshots.snapshotDiff(p2, c2, "id", Seq("c1", "c2"))
      .select("status").as[String].collect().head
    assert(d2 == "changed")
    // injection-proof: values carrying would-be separator bytes can't
    // shift a boundary into a false 'unchanged'
    val p3 = Seq((1L, "a\u0001", "b")).toDF("id", "c1", "c2")
    val c3 = Seq((1L, "a", "\u0001b")).toDF("id", "c1", "c2")
    val d3 = Snapshots.snapshotDiff(p3, c3, "id", Seq("c1", "c2"))
      .select("status").as[String].collect().head
    assert(d3 == "changed")
  }

  test("applyChangeset upserts, inserts, deletes — and refuses an " +
      "unknown op loudly instead of corrupting the snapshot") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("id", "text")
    val changes = Seq(
      (2L, "u", "two v2"),   // replace
      (3L, "d", null),       // delete
      (4L, "u", "four"))     // insert
      .toDF("id", "op", "text")
    val out = Snapshots.applyChangeset(base, changes, "id", "op",
        Seq("text"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "one"), (2L, "two v2"), (4L, "four")))
    // round trip: applying the diff-derived changeset reproduces curr
    val curr = Seq((1L, "one"), (2L, "two v3"), (5L, "five"))
      .toDF("id", "text")
    val diff = Snapshots.snapshotDiff(base, curr, "id", Seq("text"))
    val derived = diff.filter(col("status") =!= "unchanged")
      .join(curr, Seq("id"), "left")
      .select(col("id"),
        when(col("status") === "removed", "d").otherwise("u").as("op"),
        col("text"))
    val replayed = Snapshots.applyChangeset(base, derived, "id", "op",
        Seq("text"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(replayed == Seq((1L, "one"), (2L, "two v3"), (5L, "five")))
    // unknown op: loud failure, not silent passthrough
    val bad = Seq((1L, "x", "boom")).toDF("id", "op", "text")
    val e = intercept[Exception] {
      Snapshots.applyChangeset(base, bad, "id", "op", Seq("text"))
        .collect()
    }
    assert(e.getMessage != null)
    // two ops for one id: refused up front, never duplicate rows
    val dup = Seq((2L, "u", "a"), (2L, "u", "b")).toDF("id", "op", "text")
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.applyChangeset(base, dup, "id", "op", Seq("text"))
    }
    assert(e2.getMessage.contains("multiple ops"))
  }

  test("applyChangesetBucketed joins the co-bucketed sides with zero " +
      "Exchange and zero Sort, and matches the plain twin exactly") {
    val base = (1L to 400L).map(i => (i, s"doc $i")).toDF("id", "text")
    val changes = base.filter(col("id") % 5 === 0)
      .select(col("id"), lit("d").as("op"),
        lit(null).cast("string").as("text"))
      .unionByName(base.filter(col("id") % 7 === 0 && col("id") % 5 =!= 0)
        .select(col("id"), lit("u").as("op"),
          concat(col("text"), lit(" v2")).as("text")))
      .unionByName(Seq((1000L, "u", "new doc"))
        .toDF("id", "op", "text"))
    val out = Snapshots.applyChangesetBucketed(base, changes, "id",
      "op", Seq("text"), "snb_spec", 4)
    try {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(plan.contains("SortMergeJoin"), plan.take(3000))
      // bucket-sorted at write time: the full-outer SMJ needs no Sort
      assert(!plan.contains("Sort "), plan.take(3000))
      val got = out.orderBy("id").as[(Long, String)].collect().toSeq
      val want = Snapshots.applyChangeset(base, changes, "id", "op",
          Seq("text"))
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(got == want)
      assert(got.exists(_._1 == 1000L) && !got.exists(_._1 == 5L))
    } finally {
      Seq("snb_spec_base", "snb_spec_changes")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
