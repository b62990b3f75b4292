package graft.analysis

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RecordingRulesSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long): Timestamp = new Timestamp(s * 1000L)

  private lazy val df = Seq(
    (t(10), "error", "svc-a", 5.0),
    (t(20), "error", "svc-b", 7.0),
    (t(70), "error", "svc-a", 1.0),
    (t(30), "click", "svc-a", 2.0),
    (t(90), "click", "svc-a", 3.0)).toDF("ts", "kind", "svc", "v")

  test("a rule fleet evaluates in one pass with per-rule steps") {
    val out = RecordingRules.evaluate(df, "ts", Seq(
      RecordingRules.Rule("errs_by_svc", col("kind") === "error",
        col("svc"), lit(1.0), 60),
      RecordingRules.Rule("click_value", col("kind") === "click",
        lit("all"), col("v"), 120)))
      .select("rule", "bucket", "grp", "n", "sum_v")
      .as[(String, Long, String, Long, Double)].collect().toSet
    assert(out == Set(
      ("errs_by_svc", 0L, "svc-a", 1L, 1.0),
      ("errs_by_svc", 0L, "svc-b", 1L, 1.0),
      ("errs_by_svc", 60L, "svc-a", 1L, 1.0),
      ("click_value", 0L, "all", 2L, 5.0)))
  }

  test("a row matching several rules lands in each; none matching, in none") {
    val out = RecordingRules.evaluate(df, "ts", Seq(
      RecordingRules.Rule("all_rows", lit(true), col("kind"), col("v"), 3600),
      RecordingRules.Rule("big", col("v") >= 5, col("kind"), col("v"), 3600),
      RecordingRules.Rule("none", lit(false), col("kind"), col("v"), 3600)))
      .select("rule", "grp", "n")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(out == Map("all_rows" -> 5L, "big" -> 2L))
  }

  test("duplicate rule names are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      RecordingRules.evaluate(df, "ts", Seq(
        RecordingRules.Rule("x", lit(true), col("svc"), lit(1.0), 60),
        RecordingRules.Rule("x", lit(true), col("svc"), lit(1.0), 60)))
    }
    assert(e.getMessage.contains("unique"))
  }
}
