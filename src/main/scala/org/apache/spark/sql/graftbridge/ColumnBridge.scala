package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters so
  * graft can register native Catalyst expressions (the supported extension
  * route for codegen'd scalar functions — everything referenced here is in
  * the public Spark jars, this object just lives in the `sql` package tree
  * to satisfy the `private[sql]` qualifier). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A bare `LocalLimit` (per-partition row cap) with no global collect
    * phase: `df.limit(n)` plans GlobalLimit(LocalLimit(n)) whose global
    * step funnels every partition into one task — the per-partition form
    * bounds scan work while staying fully parallel. */
  def localLimit(df: org.apache.spark.sql.DataFrame, perPartition: Int)
      : org.apache.spark.sql.DataFrame = {
    val qe = df.queryExecution
    org.apache.spark.sql.classic.Dataset.ofRows(qe.sparkSession,
      org.apache.spark.sql.catalyst.plans.logical.LocalLimit(
        org.apache.spark.sql.catalyst.expressions.Literal(perPartition),
        qe.analyzed))
  }
}
