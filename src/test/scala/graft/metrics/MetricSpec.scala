package graft.metrics

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, unix_timestamp}

import graft.SparkSpec

/** Gauge / counter-rate semantics against hand-computed expectations
  * (reference scenarios: FIXTURES.md §4 — counter resets, delta vs
  * cumulative temporality, multi-series attribute hashing). */
class MetricSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  // (MetricName, ServiceName, TimeUnix, Value, Attributes, Temporality, Monotonic)
  private def metricDf(rows: Seq[(String, String, Timestamp, Double,
      Map[String, String], Int, Boolean)]): DataFrame =
    rows.toDF("MetricName", "ServiceName", "TimeUnix", "Value",
      "Attributes", "AggregationTemporality", "IsMonotonic")

  test("gauge: per-series last value then avg across series") {
    // two series (different Attributes), 1h buckets
    val df = metricDf(Seq(
      ("mem", "svc", t("2024-01-01 00:05:00"), 10.0, Map("h" -> "a"), 2, false),
      ("mem", "svc", t("2024-01-01 00:45:00"), 30.0, Map("h" -> "a"), 2, false),
      ("mem", "svc", t("2024-01-01 00:20:00"), 50.0, Map("h" -> "b"), 2, false),
      ("mem", "svc", t("2024-01-01 01:10:00"), 70.0, Map("h" -> "a"), 2, false)))
    val out = MetricCompiler.gauge(df, 3600, "avg")
      .orderBy("__time_bucket").collect()
    // hour 0: series a last=30, series b last=50 → avg 40; hour 1: a=70
    assert(out.length == 2)
    assert(out(0).getDouble(1) == 40.0)
    assert(out(1).getDouble(1) == 70.0)
  }

  test("gauge: sum across series keeps series separate per bucket") {
    val df = metricDf(Seq(
      ("m", "s", t("2024-01-01 00:01:00"), 1.0, Map("k" -> "x"), 2, false),
      ("m", "s", t("2024-01-01 00:02:00"), 2.0, Map("k" -> "x"), 2, false),
      ("m", "s", t("2024-01-01 00:03:00"), 5.0, Map("k" -> "y"), 2, false)))
    val out = MetricCompiler.gauge(df, 60, "sum")
      .orderBy("__time_bucket").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(1.0, 2.0, 5.0))
  }

  test("counter rate: cumulative with reset clamps to 0, first point 0") {
    // one series: 10, 25(+15), 5(reset→0), 12(+7)
    val df = metricDf(Seq(
      ("req", "s", t("2024-01-01 00:00:30"), 10.0, Map.empty[String, String], 2, true),
      ("req", "s", t("2024-01-01 00:01:30"), 25.0, Map.empty[String, String], 2, true),
      ("req", "s", t("2024-01-01 00:02:30"), 5.0, Map.empty[String, String], 2, true),
      ("req", "s", t("2024-01-01 00:03:30"), 12.0, Map.empty[String, String], 2, true)))
    val rates = MetricCompiler.counterRatePerRow(df)
      .orderBy("TimeUnix").select("Rate").as[Double].collect().toSeq
    assert(rates == Seq(0.0, 15.0, 0.0, 7.0))
  }

  test("counterRateInRange pads the scan so the first bucket's lag works") {
    // points at 00:00:30 (pre-range) and per-minute after; range starts
    // at 00:01:00 — the 00:01 bucket must diff 25-10=15, not report 0
    val df = metricDf(Seq(
      ("req", "s", t("2024-01-01 00:00:30"), 10.0, Map.empty[String, String], 2, true),
      ("req", "s", t("2024-01-01 00:01:30"), 25.0, Map.empty[String, String], 2, true),
      ("req", "s", t("2024-01-01 00:02:30"), 31.0, Map.empty[String, String], 2, true)))
    val from = t("2024-01-01 00:01:00").getTime / 1000
    val to = t("2024-01-01 00:03:00").getTime / 1000
    val padded = MetricCompiler.counterRateInRange(df, 60, from, to)
      .orderBy("__time_bucket").select("rate").as[Double].collect().toSeq
    assert(padded == Seq(15.0, 6.0))
    // without padding the pre-range point is invisible → first rate 0
    val unpadded = MetricCompiler.counterRate(
      df.filter(unix_timestamp(col("TimeUnix")) >= from), 60)
      .orderBy("__time_bucket").select("rate").as[Double].collect().toSeq
    assert(unpadded == Seq(0.0, 6.0))
  }

  test("counter rate: delta temporality passes through") {
    val df = metricDf(Seq(
      ("req", "s", t("2024-01-01 00:00:30"), 3.0, Map.empty[String, String], 1, true),
      ("req", "s", t("2024-01-01 00:01:30"), 4.0, Map.empty[String, String], 1, true)))
    val rates = MetricCompiler.counterRatePerRow(df)
      .orderBy("TimeUnix").select("Rate").as[Double].collect().toSeq
    assert(rates == Seq(3.0, 4.0))
  }

  test("counter rate bucketed + increase group cap") {
    // 3 groups with different totals; cap at 2
    val rows = for {
      (svc, base) <- Seq(("a", 100.0), ("b", 10.0), ("c", 1.0))
      i <- 0 to 3
    } yield ("req", svc, t(s"2024-01-01 00:0$i:00"), base * (i + 1),
      Map.empty[String, String], 2, true)
    val df = metricDf(rows)
    val out = MetricCompiler.increase(df, 60, Seq("ServiceName"), maxGroups = 2)
    val kept = out.select("ServiceName").distinct()
      .as[String].collect().toSet
    assert(kept == Set("a", "b"))
  }

  test("metricNameFilter widens migrated semantic-convention names to " +
      "both spellings (ref getMetricNameSql)") {
    val df = Seq("k8s.pod.cpu.utilization", "k8s.pod.cpu.usage",
      "k8s.pod.memory.usage", "container.cpu.usage")
      .toDF("MetricName")
    def names(f: org.apache.spark.sql.Column): Set[String] =
      df.filter(f).as[String].collect().toSet
    // a chart for the OLD name matches a mid-upgrade fleet's both names
    assert(names(MetricCompiler.metricNameFilter(
      "k8s.pod.cpu.utilization")) ==
      Set("k8s.pod.cpu.utilization", "k8s.pod.cpu.usage"))
    assert(names(MetricCompiler.metricNameFilter(
      "container.cpu.utilization")) == Set("container.cpu.usage"))
    // un-migrated names stay exact
    assert(names(MetricCompiler.metricNameFilter(
      "k8s.pod.memory.usage")) == Set("k8s.pod.memory.usage"))
  }

  test("gauge delta: extrapolated prometheus-style delta") {
    // series: 0 @t0, 60 @t0+60s within a 120s bucket → (60-0)*120/60 = 120
    val df = metricDf(Seq(
      ("g", "s", t("2024-01-01 00:00:00"), 0.0, Map.empty[String, String], 2, false),
      ("g", "s", t("2024-01-01 00:01:00"), 60.0, Map.empty[String, String], 2, false)))
    val out = MetricCompiler.gaugeDelta(df, 120, "sum").collect()
    assert(out.length == 1)
    assert(out(0).getDouble(1) == 120.0)
  }
}
