package graft.analysis

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SequenceSpec extends SparkSpec {
  import spark.implicits._

  // one key, events as (ts, label); conds = label equality for a,b,c
  private def df(rows: (Double, String)*) =
    rows.map { case (t, l) => (1L, t, l) }.toDF("k", "ts", "l")

  private val abc = Seq(col("l") === "a", col("l") === "b", col("l") === "c")

  private def m(rows: Seq[(Double, String)], pattern: String): Boolean = {
    val r = Sequence.matches(df(rows: _*), "k", "ts", abc, pattern)
      .select("matched").as[Boolean].collect()
    r.length == 1 && r.head
  }

  private def c(rows: Seq[(Double, String)], pattern: String): Long =
    Sequence.counts(df(rows: _*), "k", "ts", abc, pattern)
      .select("n_matches").as[Long].collect().head

  test("adjacency vs gap: (?1)(?2) needs consecutive considered events") {
    val gap = Seq((1.0, "a"), (2.0, "c"), (3.0, "b"))
    assert(!m(gap, "(?1)(?2)"))
    assert(m(gap, "(?1).*(?2)"))
    assert(m(gap, "(?1)(?3)(?2)"))
    assert(m(gap, "(?1).(?2)"))
  }

  test("non-considered events are skipped entirely") {
    // 'x' rows match no condition -> invisible to adjacency
    val rows = Seq((1.0, "a"), (2.0, "x"), (3.0, "b"))
    assert(m(rows, "(?1)(?2)"))
  }

  test("time guards measure between matched condition events") {
    val rows = Seq((0.0, "a"), (100.0, "b"), (1000.0, "b"))
    assert(m(rows, "(?1)(?t<=100)(?2)"))
    assert(!m(rows, "(?1)(?t<100)(?2)"))
    assert(m(rows, "(?1)(?t==100)(?2)"))
    // the far 'b' is reachable only through the gap form
    assert(m(rows, "(?1).*(?t>500)(?2)"))
    assert(!m(rows, "(?1)(?t>500)(?2)"), "adjacent b is only 100s away")
  }

  test("guard chains bind to the PREVIOUS matched cond, not the first") {
    val rows = Seq((0.0, "a"), (50.0, "b"), (60.0, "c"))
    assert(m(rows, "(?1)(?t<=50)(?2)(?t<=10)(?3)"))
    assert(!m(rows, "(?1)(?t<=50)(?2)(?t<5)(?3)"))
  }

  test("multi-condition events carry every bit they satisfy") {
    // cond1 = a-or-b, cond2 = b: one 'b' event can serve either role
    val conds = Seq(col("l") === "a" || col("l") === "b", col("l") === "b")
    val got = Sequence.matches(
      df((1.0, "b"), (2.0, "b")), "k", "ts", conds, "(?1)(?2)")
      .select("matched").as[Boolean].collect()
    assert(got.toSeq == Seq(true))
  }

  test("sequenceCount is non-overlapping, leftmost-first") {
    val rows = Seq((1.0, "a"), (2.0, "b"), (3.0, "a"), (4.0, "b"),
      (5.0, "a"))
    assert(c(rows, "(?1)(?2)") == 2L)
    assert(c(rows, "(?1).*(?2)") == 2L)
    assert(c(rows, "(?1)") == 3L)
    // a-b-a-b: greedy leftmost (?1).*(?3) with no c present
    assert(c(rows, "(?3)") == 0L)
  }

  test("parse rejects malformed patterns loudly") {
    val rows = Seq((1.0, "a"))
    for (bad <- Seq("", ".*", "(?t<5)(?1)", "(?1)(?t<5)", "(?1)(?t<5)(?t<6)(?2)",
        "(?0)", "(?64)", "(?1)x", "(?1"))
      intercept[IllegalArgumentException] { m(rows, bad) }
    // a condition index beyond the supplied list can never match — a
    // typo'd (?4) must error, not return false for every key
    intercept[IllegalArgumentException] { m(rows, "(?1)(?4)") }
  }

  test("fuzz: guard-free patterns agree with real regex search") {
    val rnd = new Random(7)
    val letters = "abc"
    val patterns = Seq("(?1)(?2)", "(?1).*(?3)", "(?2)(?2)", "(?1).(?2)",
      "(?3).*(?1)(?2)", "(?1)(?2)(?3)", "(?2).*(?1).*(?3)", "(?1)..(?1)")
    def toRegex(p: String) = p.replace("(?1)", "a").replace("(?2)", "b")
      .replace("(?3)", "c")
    for (_ <- 1 to 60) {
      val s = (1 to rnd.nextInt(12)).map(_ => letters(rnd.nextInt(3)))
      val rows = s.zipWithIndex.map { case (ch, i) =>
        (i.toDouble, ch.toString) }
      val str = s.mkString
      for (p <- patterns) {
        val want = toRegex(p).r.findFirstIn(str).isDefined
        val got = if (rows.isEmpty) false else m(rows, p)
        assert(got == want, s"pattern=$p str=$str")
        // count: non-overlapping leftmost matches; reluctant `.*?`
        // mirrors sequenceCount's resume-after-minimal-end rule
        val wantN = toRegex(p).replace(".*", ".*?").r.findAllIn(str).size
        val gotN = if (rows.isEmpty) 0L else c(rows, p)
        assert(gotN == wantN, s"count pattern=$p str=$str")
      }
    }
  }
}
