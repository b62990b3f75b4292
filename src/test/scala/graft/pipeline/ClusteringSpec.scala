package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("id", "vec")

  // sequential reference: same quantize/assign/update recursion in
  // plain Scala longs — the independent replay any engine would do
  private def reference(rows: Seq[(Long, Seq[Double])], k: Int,
      iters: Int, scale: Long): (Map[Long, (Int, Long)], Seq[Seq[Long]]) = {
    def quant(v: Seq[Double]): Seq[Long] =
      v.map(x => BigDecimal(x * scale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val q = rows.map { case (id, v) => (id, quant(v)) }
    var cents = q.sortBy(_._1).take(k).map(_._2)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(v: Seq[Long]): (Long, Int) =
      cents.zipWithIndex.map { case (c, j) => (d2(v, c), j) }.min
    for (_ <- 1 to iters) {
      val byC = q.groupBy { case (_, v) => assign(v)._2 }
      cents = cents.zipWithIndex.map { case (prev, j) =>
        byC.get(j) match {
          case None => prev
          case Some(members) =>
            val dim = prev.length
            (0 until dim).map { d =>
              val s = members.map(_._2(d)).sum
              val v = s.toDouble / members.size
              math.signum(v).toLong * math.round(math.abs(v))
            }
        }
      }
    }
    (q.map { case (id, v) =>
      val (dd, c) = assign(v); id -> (c, dd)
    }.toMap, cents)
  }

  test("kMeans hand case: two obvious 2-d clusters separate; centroids " +
      "are the exact quantized means") {
    val rows = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.1, 0.0)), (3L, Seq(0.0, 0.1)),
      (4L, Seq(5.0, 5.0)), (5L, Seq(5.1, 5.0)), (6L, Seq(5.0, 5.1)))
    val (a, c) = Clustering.kMeans(df(rows), "id", "vec", k = 2,
      iters = 3, scale = 100L)
    val got = a.select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(4L), got(5L), got(6L)).size == 1)
    assert(got(1L) != got(4L))
    // cluster of point 1 centroid = mean of (0,0),(10,0),(0,10) rounded
    val cA = c(got(1L)).toSeq
    assert(cA == Seq(3L, 3L)) // (0+10+0)/3 = 3.33 -> 3
    val cB = c(got(4L)).toSeq
    assert(cB == Seq(503L, 503L))
  }

  test("kMeans matches the sequential reference and is partitioning-" +
      "invariant") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 80L).map { i =>
      val base = if (i % 3 == 0) 0.5 else if (i % 3 == 1) -0.5 else 0.0
      (i, Seq.fill(8)(base + rnd.nextGaussian() * 0.05))
    }
    val (a, c) = Clustering.kMeans(df(rows), "id", "vec", k = 3,
      iters = 4, scale = 10000L)
    val got = a.select("id", "cluster", "dist2")
      .as[(Long, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (want, wantC) = reference(rows, 3, 4, 10000L)
    assert(got == want)
    assert(c.map(_.toSeq) == wantC)
    val (a7, c7) = Clustering.kMeans(df(rows).repartition(7), "id",
      "vec", k = 3, iters = 4, scale = 10000L)
    assert(a7.select("id", "cluster", "dist2").as[(Long, Int, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap == got)
    assert(c7.map(_.toSeq) == c.map(_.toSeq))
  }

  test("an emptied cluster keeps its previous centroid") {
    // ids 1,2 init the two centroids but every point sits at (1,1):
    // cluster 1 empties on iteration 1 (ties go to cluster 0)
    val rows = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(1.0, 1.0)),
      (3L, Seq(1.0, 1.0)))
    val (a, c) = Clustering.kMeans(df(rows), "id", "vec", k = 2,
      iters = 2, scale = 10L)
    assert(a.select("cluster").as[Int].collect().toSet == Set(0))
    assert(c(1).toSeq == Seq(10L, 10L)) // the init centroid, retained
  }

  test("overflow audit is loud") {
    val rows = Seq((1L, Seq(1.0)), (2L, Seq(-1.0)))
    intercept[IllegalArgumentException] {
      Clustering.kMeans(df(rows), "id", "vec", k = 1, iters = 1,
        scale = 1L << 40)
    }
  }
}
