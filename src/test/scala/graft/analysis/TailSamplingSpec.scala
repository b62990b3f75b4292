package graft.analysis

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TailSamplingSpec extends SparkSpec {
  import spark.implicits._

  // (trace, span, isError, durMs)
  private lazy val spans = Seq(
    (1L, 10L, false, 30.0), (1L, 11L, true, 10.0), (1L, 12L, false, 5.0),
    (2L, 20L, false, 900.0), (2L, 21L, false, 20.0),
    (3L, 30L, false, 15.0), (3L, 31L, false, 25.0),
    (4L, 40L, false, 40.0)).toDF("trace", "span", "err", "dur")

  test("error beats latency beats prob; kept traces keep every span") {
    // trace 1 has an error (reason stays "error" even if latency also
    // cleared); trace 2 is slow; traces 3/4 fall to the probabilistic
    // policy at fraction 0 → dropped
    val out = TailSampling.sample(spans, "trace", col("err"), col("dur"),
      latencyThreshold = 100.0, keepFraction = 0.0)
      .select("trace", "span", "reason")
      .as[(Long, Long, String)].collect()
    val byTrace = out.groupBy(_._1)
    assert(byTrace.keySet == Set(1L, 2L))
    assert(byTrace(1L).map(_._3).toSet == Set("error"))
    assert(byTrace(1L).map(_._2).toSet == Set(10L, 11L, 12L))
    assert(byTrace(2L).map(_._3).toSet == Set("latency"))
    assert(byTrace(2L).map(_._2).toSet == Set(20L, 21L))
  }

  test("probabilistic policy is deterministic on the trace-id hash") {
    val v1 = TailSampling.verdicts(spans, "trace", col("err"), col("dur"),
      latencyThreshold = 1e9, keepFraction = 0.5)
      .as[(Long, String)].collect().toMap
    val v2 = TailSampling.verdicts(spans, "trace", col("err"), col("dur"),
      latencyThreshold = 1e9, keepFraction = 0.5)
      .as[(Long, String)].collect().toMap
    assert(v1 == v2)
    // error policy still fires under an unreachable latency threshold
    assert(v1(1L) == "error")
    // non-error keeps (if any) carry the prob reason
    assert(v1.removed(1L).values.forall(_ == "prob"))
    // keepFraction 1.0 keeps every trace
    val all = TailSampling.verdicts(spans, "trace", col("err"), col("dur"),
      latencyThreshold = 1e9, keepFraction = 1.0).count()
    assert(all == 4)
  }

  test("keepFraction is validated loudly") {
    val e = intercept[IllegalArgumentException] {
      TailSampling.verdicts(spans, "trace", col("err"), col("dur"), 1.0, 1.5)
    }
    assert(e.getMessage.contains("keepFraction"))
  }
}
