package graft.compile

import java.sql.Timestamp

import graft.SparkSpec
import graft.ir._

/** Sample-weighted aggregation semantics (reference
  * renderChartConfig.ts:556-624): a row with SampleRate w stands for w
  * identical rows. */
class WeightedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalog: Catalog = {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:01"), 10.0, "3"),
      (Timestamp.valueOf("2024-01-01 00:00:02"), 20.0, "1"),
      // unparsable weight → greatest(toUInt64OrZero, 1) = 1
      (Timestamp.valueOf("2024-01-01 00:00:03"), 30.0, "x"))
      .toDF("ts", "dur", "sample_rate")
    new Catalog(Map("spans" -> Source(df,
      timestampColumn = Some("ts"),
      sampleWeightExpression = Some("sample_rate"))))
  }

  private def run(item: SelectItem): Double = {
    val q = Query(select = Seq(item), from = "spans")
    val r = QueryCompiler.compile(q, catalog).collect().head
    r.getAs[Any](0) match {
      case d: Double => d
      case l: Long => l.toDouble
      case x => x.toString.toDouble
    }
  }

  test("weighted count = sum of weights (bad weight clamps to 1)") {
    assert(run(SelectItem("", Some("cnt"), Some(AggFn.Count))) == 5.0)
  }

  test("weighted sum and avg") {
    // expansion: 10×3, 20×1, 30×1 → sum 80, avg 16
    assert(run(SelectItem("dur", Some("s"), Some(AggFn.Sum))) == 80.0)
    assert(run(SelectItem("dur", Some("a"), Some(AggFn.Avg))) == 16.0)
  }

  test("weighted quantile: nearest-rank over the expanded multiset") {
    // expanded sorted: 10,10,10,20,30 → p50 rank 2.5 → 10; p90 rank 4.5 → 30
    assert(run(SelectItem("dur", Some("p50"),
      Some(AggFn.Quantile(0.5)))) == 10.0)
    assert(run(SelectItem("dur", Some("p90"),
      Some(AggFn.Quantile(0.9)))) == 30.0)
  }

  test("weighted conditional count") {
    assert(run(SelectItem("", Some("c"), Some(AggFn.Count),
      Some(Cond.Sql("dur >= 20")))) == 2.0)
  }

  test("min/max deliberately uncorrected") {
    assert(run(SelectItem("dur", Some("m"), Some(AggFn.Max))) == 30.0)
    assert(run(SelectItem("dur", Some("m"), Some(AggFn.Min))) == 10.0)
  }
}
