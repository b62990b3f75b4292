package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

/** Shared PQ math for [[PqLut]] / [[PqEncode]]: per subspace j and code
  * c, the partial squared L2 distance ‖cent‖² − 2·(v_j · cent) (the
  * ‖v_j‖² term is constant within a probe/row and cancels in ranking).
  * Value-identical to the unrolled expression form it replaces
  * (`lit(cn2) − 2.0 * dot(slice(v,…), array(lits))`): the dot sums in
  * ascending index order skipping null elements over the shorter
  * length, then one `cn2 − 2.0·d`. The unrolled form built
  * m × ksub × (dsub + ~10) Catalyst nodes PER CALL SITE (~2.5k nodes at
  * m=8, ksub=16, dsub=8) — paid again at every analysis, optimization,
  * canonicalization and codegen of every plan carrying it; these
  * expressions are ONE node with the codebooks as a reference object
  * (the [[CentroidSims]] discipline). */
private[functions] object PqMath {
  /** cn2(j)(c) = Σ cent² — same left-to-right Scala sum as the
    * plan-time literal it replaces. */
  def cn2Of(books: Array[Array[Array[Double]]]): Array[Array[Double]] =
    books.map(_.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

  /** One LUT row: out(c) = cn2(c) − 2 · (v[off ..] · book(c)). */
  def lutRow(v: ArrayData, off: Int, book: Array[Array[Double]],
      cn2: Array[Double], out: Array[Double]): Unit = {
    val vn = v.numElements()
    var c = 0
    while (c < book.length) {
      val cent = book(c)
      val n = math.min(cent.length, math.max(vn - off, 0))
      var d = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(off + i)) d += v.getDouble(off + i) * cent(i)
        i += 1
      }
      out(c) = cn2(c) - 2.0 * d
      c += 1
    }
  }
}

/** Full ADC lookup table per row: array<array<double>> of
  * m × ksub partial distances — the probe-side half of PQ search.
  * See [[PqMath]] for the exact-value contract. */
case class PqLut(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_lut requires array<double>, got $t")
    }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)

  override def prettyName: String = "pq_lut"

  @transient private lazy val mat: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cn2: Array[Array[Double]] =
    PqMath.cn2Of(mat)
  @transient private lazy val dsub: Int =
    mat.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[ArrayData](mat.length)
    var j = 0
    while (j < mat.length) {
      val row = new Array[Double](mat(j).length)
      PqMath.lutRow(v, j * dsub, mat(j), cn2(j), row)
      out(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("books", mat, "double[][][]")
      val cn = ctx.addReferenceObj("cn2", cn2, "double[][]")
      val gad = classOf[GenericArrayData].getName
      val ad = classOf[ArrayData].getName
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val off = ctx.freshName("off")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |$ad[] $out = new $ad[$m.length];
         |int $off = 0;
         |for (int $j = 0; $j < $m.length; $j++) {
         |  double[] $row = new double[$m[$j].length];
         |  for (int $c = 0; $c < $m[$j].length; $c++) {
         |    double[] $cent = $m[$j][$c];
         |    int $n = java.lang.Math.min($cent.length,
         |      java.lang.Math.max($v.numElements() - $off, 0));
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($off + $i))
         |        $d += $v.getDouble($off + $i) * $cent[$i];
         |    }
         |    $row[$c] = $cn[$j][$c] - 2.0 * $d;
         |  }
         |  $out[$j] = new $gad($row);
         |  $off += ($m[$j].length == 0) ? 0 : $m[$j][0].length;
         |}
         |${ev.value} = new $gad((Object[]) $out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : PqLut = copy(child = newChild)
}

/** PQ codes per row: array<int> of m first-argmin code indexes over
  * the same partial distances [[PqLut]] builds — the build-side half
  * of PQ. First-minimum tie-break (strict `<`), matching the
  * `array_position(dists, array_min(dists))` form it replaces. */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires array<double>, got $t")
    }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  @transient private lazy val mat: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cn2: Array[Array[Double]] =
    PqMath.cn2Of(mat)
  @transient private lazy val dsub: Int =
    mat.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](mat.length)
    val row = new Array[Double](if (mat.isEmpty) 0 else mat(0).length)
    var j = 0
    while (j < mat.length) {
      PqMath.lutRow(v, j * dsub, mat(j), cn2(j), row)
      var best = 0
      var c = 1
      while (c < row.length) {
        if (row(c) < row(best)) best = c
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("books", mat, "double[][][]")
      val cn = ctx.addReferenceObj("cn2", cn2, "double[][]")
      val gad = classOf[GenericArrayData].getName
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val off = ctx.freshName("off")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cur = ctx.freshName("cur")
      s"""
         |int[] $codes = new int[$m.length];
         |int $off = 0;
         |for (int $j = 0; $j < $m.length; $j++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $m[$j].length; $c++) {
         |    double[] $cent = $m[$j][$c];
         |    int $n = java.lang.Math.min($cent.length,
         |      java.lang.Math.max($v.numElements() - $off, 0));
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($off + $i))
         |        $d += $v.getDouble($off + $i) * $cent[$i];
         |    }
         |    double $cur = $cn[$j][$c] - 2.0 * $d;
         |    if ($c == 0 || $cur < $bestD) { $bestD = $cur; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |  $off += ($m[$j].length == 0) ? 0 : $m[$j][0].length;
         |}
         |${ev.value} = new $gad($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : PqEncode = copy(child = newChild)
}

/** Int8 symmetric-quantization audit row: [max|x|, max reconstruction
  * error] in ONE codegen pass. The HOF form inlined the O(n)
  * `array_max(transform(v, abs))` scale INTO the per-element error
  * lambda (Catalyst's project collapsing re-inlines any attempt to
  * hoist it), making the row O(n²) in interpreted lambda calls — JFR'd
  * as the whole cost of the embedding-quantization query.
  * Value-identical math: mx = max |x| (null elements skipped), scale =
  * mx/127, err = |x − floor(x/scale + 0.5)·scale| with an
  * order-independent max; a zero/NaN-producing scale is the CALLER's
  * guard exactly as before (this returns the raw max-err double). */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"int8_quant_stats requires array<double>, got $t")
    }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "int8_quant_stats"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getDouble(i))
        if (a > mx) mx = a
      }
      i += 1
    }
    if (mx == Double.NegativeInfinity) mx = 0.0
    val scale = mx / 127.0
    var me = Double.NegativeInfinity
    i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = v.getDouble(i)
        val e = math.abs(x - math.floor(x / scale + 0.5) * scale)
        if (e > me) me = e
      }
      i += 1
    }
    if (me == Double.NegativeInfinity) me = 0.0
    new GenericArrayData(Array(mx, me))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val scale = ctx.freshName("scale")
      val me = ctx.freshName("me")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val a = ctx.freshName("a")
      val e = ctx.freshName("e")
      s"""
         |int $n = $v.numElements();
         |double $mx = Double.NEGATIVE_INFINITY;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    double $a = java.lang.Math.abs($v.getDouble($i));
         |    if ($a > $mx) $mx = $a;
         |  }
         |}
         |if ($mx == Double.NEGATIVE_INFINITY) $mx = 0.0;
         |double $scale = $mx / 127.0;
         |double $me = Double.NEGATIVE_INFINITY;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    double $x = $v.getDouble($i);
         |    double $e = java.lang.Math.abs(
         |      $x - java.lang.Math.floor($x / $scale + 0.5) * $scale);
         |    if ($e > $me) $me = $e;
         |  }
         |}
         |if ($me == Double.NEGATIVE_INFINITY) $me = 0.0;
         |${ev.value} = new $gad(new double[] { $mx, $me });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Int8QuantStats = copy(child = newChild)
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

  /** Codegen'd m × ksub ADC lookup table against plan-time codebooks. */
  def pqLut(v: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLut(
      ColumnBridge.expression(v.cast("array<double>")),
      books.map(_.map(_.toSeq).toSeq).toSeq))

  /** Codegen'd PQ code row (first-argmin per subspace) against
    * plan-time codebooks. */
  def pqEncode(v: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(v.cast("array<double>")),
      books.map(_.map(_.toSeq).toSeq).toSeq))

  /** Codegen'd [max|x|, max int8 reconstruction error] audit row. */
  def int8QuantStats(v: Column): Column =
    ColumnBridge.column(Int8QuantStats(
      ColumnBridge.expression(v.cast("array<double>"))))
}
