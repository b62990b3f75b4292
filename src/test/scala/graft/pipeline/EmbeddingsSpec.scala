package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("embeddingStats lands each pathology in exactly its counter " +
      "and excludes unusable rows from the norm distribution") {
    val rows = Seq(
      (1L, Some(Seq(3.0f, 4.0f)), 0),  // norm 5
      (2L, Some(Seq(0.0f, 0.0f)), 0),  // zero vector
      (3L, None, 0),                   // null
      (4L, Some(Seq(1.0f, Float.NaN)), 0), // NaN
      (5L, Some(Seq(1.0f, 2.0f, 2.0f)), 0)) // wrong dim
      .toDF("vec_id", "embedding", "label")
    val out = Embeddings.embeddingStats(rows, "label", "embedding",
      dim = 2).collect().head
    def g(c: String) = out.getLong(out.fieldIndex(c))
    assert(g("n") == 5L && g("n_null") == 1L && g("n_nan") == 1L &&
      g("n_bad_dim") == 1L && g("n_zero") == 1L)
    // distribution over the two usable norms only: 5 and 0
    assert(out.getDouble(out.fieldIndex("norm_min")) == 0.0)
    assert(out.getDouble(out.fieldIndex("norm_max")) == 5.0)
    assert(out.getDouble(out.fieldIndex("norm_med")) == 2.5)
  }

  test("randomProject: deterministic across partitionings, ±1 signs " +
      "only, and approximately norm-preserving on average (JL)") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .limit(50)
    val p1 = Embeddings.randomProject(e, "embedding", 16)
      .select("vec_id", "projected")
      .as[(Long, Seq[Double])].collect().toMap
    val p2 = Embeddings.randomProject(e.repartition(7), "embedding", 16)
      .select("vec_id", "projected")
      .as[(Long, Seq[Double])].collect().toMap
    assert(p1 == p2) // matrix is a pure function of (i, j)
    assert(p1.values.forall(_.length == 16))
    // a ±1 projection of a one-hot vector returns ±1 exactly
    val oneHot = Seq((1L, (1.0f +: Seq.fill(63)(0.0f))))
      .toDF("vec_id", "embedding")
    val oh = Embeddings.randomProject(oneHot, "embedding", 4)
      .select("projected").as[Seq[Double]].collect().head
    assert(oh.forall(x => x == 1.0 || x == -1.0), oh)
    // empty and null vectors answer zero-vector / null — never the
    // element_at(v, 0) crash a descending sequence(1, 0) would cause
    val edge = Seq((1L, Some(Seq.empty[Float])),
      (2L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    val er = Embeddings.randomProject(edge, "embedding", 4)
      .orderBy("vec_id").select("projected")
      .as[Option[Seq[Double]]].collect().toSeq
    assert(er(0).contains(Seq(0.0, 0.0, 0.0, 0.0)))
    assert(er(1).isEmpty)
    // E[‖Px‖²] = k·‖x‖² for ±1 entries (each of the k output coords
    // has expectation ‖x‖²): the normalized ratio should hover near 1
    val ratios = e.limit(20)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (id, v) =>
        val pv = p1(id)
        val n2 = v.map(x => x.toDouble * x).sum
        val pn2 = pv.map(x => x * x).sum
        pn2 / (n2 * 16)
      }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.3 && mean < 3.0, s"JL scale ratio $mean")
  }

  test("quantizeInt8Stats: scale = max|x|/127, the error bound is " +
      "half a quantization step, and the zero vector is exact") {
    val df = Seq(
      (1L, Array(127.0f, -127.0f, 63.5f)),  // scale 1: codes exact-ish
      (2L, Array(0.0f, 0.0f)),              // zero vector
      (3L, Array(1.0f))                      // single dim: code 127
    ).toDF("id", "vec")
    val out = Embeddings.quantizeInt8Stats(df, "id", "vec")
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("scale") == 1.0)
    assert(out(0).getAs[Int]("n_dims") == 3)
    // max error ≤ scale/2 (63.5 rounds to 64 → err 0.5)
    assert(out(0).getAs[Double]("max_abs_err") == 0.5)
    assert(out(1).getAs[Double]("scale") == 0.0 &&
      out(1).getAs[Double]("max_abs_err") == 0.0)
    // 1.0/scale = 127 exactly → zero reconstruction error
    assert(out(2).getAs[Double]("max_abs_err") == 0.0)
    // general bound on real-ish values: err ≤ scale/2 + rounding dust
    val v = (1 to 16).map(i => (i * 0.37f - 3.0f)).toArray
    val r = Embeddings.quantizeInt8Stats(
      Seq((9L, v)).toDF("id", "vec"), "id", "vec").collect().head
    assert(r.getAs[Double]("max_abs_err") <=
      r.getAs[Double]("scale") / 2 + 1e-6)
  }
}
