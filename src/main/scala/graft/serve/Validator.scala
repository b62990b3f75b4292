package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.compile.{Catalog, QueryCompiler}
import graft.ir.Query

/** Pre-flight config validation — the engine's analogue of the
  * reference's `testChartConfigValidity`, which runs `EXPLAIN ESTIMATE`
  * on the rendered SQL to reject broken configs before execution
  * (packages/common-utils/src/clickhouse/index.ts:881-927). Here the
  * compile + Catalyst analysis phase plays the EXPLAIN role: an unknown
  * column, a bad SQL expression string, or an unknown source surfaces as
  * an analysis error WITHOUT touching data, and the optimized plan's
  * statistics supply the row/byte estimate (parquet footer totals scaled
  * through the plan — Spark's equivalent of EXPLAIN ESTIMATE's
  * part-level counts). */
object Validator {

  final case class Validation(
      valid: Boolean,
      error: Option[String],
      /** Optimizer row estimate for the plan's leaves; None when stats
        * are unavailable (e.g. after a shuffle-only estimate). */
      estimatedRows: Option[BigInt],
      estimatedBytes: Option[BigInt]) {
    def toJson: String = {
      val err = error.map(e =>
        "\"error\":" + QueryJsonOut.quote(e) + ",").getOrElse("")
      val rows = estimatedRows.map(r => s""""estimatedRows":$r,""")
        .getOrElse("")
      val bytes = estimatedBytes.map(b => s""""estimatedBytes":$b,""")
        .getOrElse("")
      s"""{$err$rows$bytes"valid":$valid}"""
    }
  }

  /** Compile + analyze the query; never executes a job. */
  def validate(q: Query, catalog: Catalog, spark: SparkSession)
      : Validation =
    try {
      val df = QueryCompiler.compile(q, catalog)
      analyzed(df)
    } catch {
      case e: Exception =>
        Validation(valid = false,
          error = Some(Option(e.getMessage).getOrElse(e.toString)),
          estimatedRows = None, estimatedBytes = None)
    }

  private def analyzed(df: DataFrame): Validation = {
    // forcing the analyzed plan surfaces unresolved-column errors;
    // optimizedPlan.stats reads parquet footers, not data
    df.queryExecution.assertAnalyzed()
    val stats = df.queryExecution.optimizedPlan.stats
    Validation(valid = true, error = None,
      estimatedRows = stats.rowCount,
      estimatedBytes = Some(stats.sizeInBytes))
  }
}
