package graft.analysis

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CriticalPathSpec extends SparkSpec {
  import spark.implicits._

  private def spans(rows: (Long, Option[Long], Long, Long)*) =
    rows.map { case (i, p, s, e) => (i, p.map(Long.box).orNull, s, e) }
      .toDF("id", "parent", "s", "e")

  private def selfOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    CriticalPath.selfTime(df).select("id", "self_time")
      .as[(Long, Long)].collect().toMap

  test("leaf spans keep their full duration") {
    val got = selfOf(spans((1L, None, 0L, 10L), (2L, Some(1L), 20L, 25L)))
    // child [20,25) is outside parent [0,10): contributes nothing
    assert(got == Map(1L -> 10L, 2L -> 5L))
  }

  test("nested child subtracts exactly once; overlapping siblings union") {
    // parent [0,100); children [10,30), [20,50) overlap -> union [10,50)=40
    val got = selfOf(spans((1L, None, 0L, 100L),
      (2L, Some(1L), 10L, 30L), (3L, Some(1L), 20L, 50L)))
    assert(got(1L) == 60L)
    assert(got(2L) == 20L && got(3L) == 30L)
  }

  test("touching siblings cover contiguously; child clipped to parent") {
    // children [0,10) [10,20) touch: covered 20; child [90,200) clips
    // to [90,100): 10 more
    val got = selfOf(spans((1L, None, 0L, 100L),
      (2L, Some(1L), 0L, 10L), (3L, Some(1L), 10L, 20L),
      (4L, Some(1L), 90L, 200L)))
    assert(got(1L) == 100L - 20L - 10L)
  }

  test("identical sibling intervals count once") {
    val got = selfOf(spans((1L, None, 0L, 50L),
      (2L, Some(1L), 5L, 15L), (3L, Some(1L), 5L, 15L)))
    assert(got(1L) == 40L)
  }

  test("grandchildren subtract from their own parent, not the root") {
    // root [0,100) <- mid [10,60) <- leaf [20,30)
    val got = selfOf(spans((1L, None, 0L, 100L),
      (2L, Some(1L), 10L, 60L), (3L, Some(2L), 20L, 30L)))
    assert(got == Map(1L -> 50L, 2L -> 40L, 3L -> 10L))
  }

  test("fuzz: union length equals the per-second census") {
    val rnd = new Random(42)
    val rows = (0L until 200L).map { i =>
      val parent = if (i < 10) None else Some(i / 5)
      val s = rnd.nextInt(500).toLong
      (i, parent, s, s + 1L + rnd.nextInt(80))
    }
    val got = CriticalPath.selfTime(spans(rows: _*))
      .select("id", "covered").as[(Long, Long)].collect().toMap
    // sequential census: for each parent, the distinct covered seconds
    val byParent = rows.filter(_._2.isDefined).groupBy(_._2.get)
    val bounds = rows.map(r => r._1 -> (r._3, r._4)).toMap
    rows.foreach { case (id, _, s, e) =>
      val want = byParent.get(id).fold(0L) { ch =>
        ch.flatMap { case (_, _, cs, ce) =>
          (math.max(cs, s) until math.min(ce, e))
        }.distinct.size.toLong
      }
      assert(got(id) == want, s"id=$id bounds=${bounds(id)}")
    }
  }
}
