package graft.analysis

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  private def run(rows: Seq[(Int, Double, String)], window: Double)
      : Map[Int, Int] =
    Funnel.levels(rows.toDF("u", "ts", "ev"), "u", "ts", "ev", steps,
        window)
      .as[(Int, Int)].collect().toMap

  /** Sequential reference: the same greedy recurrence, written
    * independently over a plain sorted list. */
  private def refLevel(evs: Seq[(Double, Int)], window: Double): Int = {
    val best = Array.fill(steps.size)(Double.NegativeInfinity)
    for ((t, l) <- evs.sortBy(identity)) {
      if (l == 0) best(0) = math.max(best(0), t)
      else if (best(l - 1) > Double.NegativeInfinity &&
        t - best(l - 1) <= window) best(l) = math.max(best(l), best(l - 1))
    }
    best.lastIndexWhere(_ > Double.NegativeInfinity) + 1
  }

  test("full chain inside window") {
    assert(run(Seq((1, 0.0, "view"), (1, 5.0, "click"), (1, 9.0, "buy")),
      10.0) == Map(1 -> 3))
  }

  test("window anchors at the chain's FIRST step") {
    // click fits after view, but buy is 11s after the view anchor
    assert(run(Seq((1, 0.0, "view"), (1, 5.0, "click"), (1, 11.0, "buy")),
      10.0) == Map(1 -> 2))
    // a LATER view restarts the chain and rescues the buy
    assert(run(Seq((1, 0.0, "view"), (1, 4.0, "view"), (1, 5.0, "click"),
      (1, 11.0, "buy")), 10.0) == Map(1 -> 3))
  }

  test("later-step events before the entry step do not chain") {
    assert(run(Seq((1, 0.0, "buy"), (1, 1.0, "click"), (1, 2.0, "view")),
      10.0) == Map(1 -> 1))
    // no entry step at all -> level 0
    assert(run(Seq((2, 0.0, "click"), (2, 1.0, "buy")), 10.0) ==
      Map(2 -> 0))
  }

  test("out-of-order step arrival within one timestamp may chain") {
    // equal timestamps sort (ts, lvl): view then click -> chains
    assert(run(Seq((1, 5.0, "click"), (1, 5.0, "view")), 10.0) ==
      Map(1 -> 2))
  }

  test("non-step events are ignored, keys without step events absent") {
    val got = run(Seq((1, 0.0, "view"), (1, 1.0, "scroll"),
      (2, 0.0, "scroll")), 10.0)
    assert(got == Map(1 -> 1))
  }

  test("fuzz: matches the sequential reference on random event streams") {
    val rnd = new scala.util.Random(11)
    val evs = Seq("view", "click", "buy", "other")
    val rows = for {
      u <- 1 to 60
      _ <- 1 to rnd.nextInt(30)
    } yield (u, rnd.nextInt(500).toDouble, evs(rnd.nextInt(evs.size)))
    for (window <- Seq(5.0, 50.0, 1000.0)) {
      val got = run(rows, window)
      val want = rows.filter(r => steps.contains(r._3))
        .groupBy(_._1)
        .map { case (u, rs) =>
          u -> refLevel(rs.map(r => (r._2, steps.indexOf(r._3))), window)
        }
      assert(got == want, s"window=$window")
    }
  }

  test("report: exact histogram + cumulative conversion curve") {
    val rows = Seq((1, 0.0, "view"), (1, 1.0, "click"), (1, 2.0, "buy"),
      (2, 0.0, "view"), (2, 1.0, "click"), (3, 0.0, "view"),
      (4, 0.0, "click"))
    val got = Funnel.report(rows.toDF("u", "ts", "ev"), "u", "ts", "ev",
        steps, 10.0)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0, 1L, 4L), (1, 1L, 3L), (2, 1L, 2L),
      (3, 1L, 1L)))
  }
}

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  test("cohort table: hand-derived counts and rates") {
    // users 1,2 first active day 0; user 3 first active day 1.
    // day 1: users 1,3 active; day 2: users 2,3.
    def t(day: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00")
    val df = Seq((1, t(0)), (2, t(0)), (1, t(1)), (3, t(1)), (2, t(2)),
      (3, t(2)), (1, t(1))).toDF("u", "ts")
    val got = Retention.table(df, "u", "ts")
      .select(col("cohort").cast("string"), col("offset_days"),
        col("n_active"), col("n_cohort"), col("rate"))
      .as[(String, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-01", 2L, 1L, 2L, 0.5),
      ("2024-01-02", 0L, 1L, 1L, 1.0),
      ("2024-01-02", 1L, 1L, 1L, 1.0)))
  }
}
