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

  /** Full ColumnNode → Expression conversion. `ExpressionUtils.expression`
    * wraps the node lazily (fine inside a plan, where analysis converts it),
    * but `.sql` on a lazily-wrapped tree prints the wrapper's pretty name
    * (`columnnodeexpression(...)`) for DSL-built columns — the eager
    * converter yields the real Catalyst tree for serialization. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

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
