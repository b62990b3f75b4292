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

/** Cosine similarities of one vector against a PLAN-TIME centroid
  * matrix, fused into one codegen loop — the IVF cell-assignment row
  * (`Similarity` quantizers: rows × nlist cosines on every corpus
  * scan). The `transform(centLits, ct => cosine(v, ct))` form runs the
  * lambda INTERPRETED per centroid (boxing an ArrayData element each
  * step), and unrolling it into nlist separate expressions explodes
  * the codegen tree instead (measured 9× slower at 200k rows). This
  * expression is value-identical to the transform form: ‖v‖ is hoisted
  * (the same double every cell), dots sum in ascending index order
  * skipping null elements, and a zero norm-product answers 0.0. */
case class CentroidSims(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"centroid_sims requires array<double>, got $t")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "centroid_sims"

  // Seq-typed field so canonicalized equality stays structural; the
  // hot loops read the array form
  @transient private lazy val mat: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val cnorms: Array[Double] =
    mat.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    var nv = 0.0
    var i = 0
    while (i < vn) {
      if (!v.isNullAt(i)) { val x = v.getDouble(i); nv += x * x }
      i += 1
    }
    val vnorm = math.sqrt(nv)
    val out = new Array[Double](mat.length)
    var c = 0
    while (c < mat.length) {
      val ct = mat(c)
      val n = math.min(vn, ct.length)
      var d = 0.0
      var j = 0
      while (j < n) {
        if (!v.isNullAt(j)) d += v.getDouble(j) * ct(j)
        j += 1
      }
      val prod = vnorm * cnorms(c)
      out(c) = if (prod == 0) 0.0 else d / prod
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("cents", mat, "double[][]")
      val cn = ctx.addReferenceObj("cnorms", cnorms, "double[]")
      val vn = ctx.freshName("vn")
      val nv = ctx.freshName("nv")
      val vnorm = ctx.freshName("vnorm")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val ct = ctx.freshName("ct")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val prod = ctx.freshName("prod")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $vn = $v.numElements();
         |double $nv = 0.0;
         |for (int $i = 0; $i < $vn; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    double __x = $v.getDouble($i);
         |    $nv += __x * __x;
         |  }
         |}
         |double $vnorm = java.lang.Math.sqrt($nv);
         |double[] $out = new double[$m.length];
         |for (int $c = 0; $c < $m.length; $c++) {
         |  double[] $ct = $m[$c];
         |  int $n = java.lang.Math.min($vn, $ct.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$v.isNullAt($j)) $d += $v.getDouble($j) * $ct[$j];
         |  }
         |  double $prod = $vnorm * $cn[$c];
         |  $out[$c] = ($prod == 0.0) ? 0.0 : $d / $prod;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : CentroidSims = copy(child = newChild)
}

object VectorOps {
  /** Codegen'd dot product of two `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  /** Codegen'd cosine row of a vector against plan-time centroids. */
  def centroidSims(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidSims(
      ColumnBridge.expression(v.cast("array<double>")),
      cents.map(_.toSeq).toSeq))

  /** Codegen'd running cumulative sum of an `array<double>` column. */
  def cumSum(a: Column): Column =
    ColumnBridge.column(ArrayCumSum(
      ColumnBridge.expression(a.cast("array<double>"))))
}
