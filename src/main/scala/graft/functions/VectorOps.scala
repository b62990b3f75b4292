package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The higher-order-function form (`aggregate(zip_with(a, b, _ * _), ...)`)
  * runs its lambdas interpreted — per-element virtual calls outside
  * whole-stage codegen — which dominates the vector-similarity pipelines
  * (cosine scoring is one dot product per candidate pair). This expression
  * participates in whole-stage codegen: one fused Java loop over the two
  * `ArrayData`, no per-element allocation.
  *
  * Summation runs in ascending index order — the same order as the
  * `zip_with`/`aggregate` fold and DuckDB's `list_sum` — so on NULL-FREE
  * arrays results are bit-for-bit compatible with both the previous
  * expression form and the oracle. Null-element semantics deliberately
  * differ: a null element contributes 0 here, where the lambda form's `+`
  * propagated it to a NULL result; mismatched lengths use the shorter
  * prefix. Embeddings are fixed-width and null-free by contract, so
  * neither case arises on the pipeline paths.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<double> arguments, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) d += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $d += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

/** Running cumulative sum over an `array<double>` (ClickHouse
  * `arrayCumSum`) as one codegen'd O(n) pass. The higher-order-function
  * form (slice+aggregate per index) is O(n²) in interpreted lambdas.
  * Prefix i accumulates left-to-right — on null-free arrays bit-for-bit
  * the values the slice+aggregate form produced. Null elements contribute
  * 0 (the lambda form propagated NULL). */
case class ArrayCumSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"array_cum_sum requires array<double>, got $t")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "array_cum_sum"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) acc += a.getDouble(i)
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) $acc += $a.getDouble($i);
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : ArrayCumSum = copy(child = newChild)
}

object VectorOps {
  /** Codegen'd dot product of two `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** Codegen'd running cumulative sum of an `array<double>` column. */
  def cumSum(a: Column): Column =
    ColumnBridge.column(ArrayCumSum(
      ColumnBridge.expression(a.cast("array<double>"))))
}
