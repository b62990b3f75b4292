package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Exp-histogram bucket downscaling as a native codegen'd expression.
  *
  * Normalizing a bucket-count array from scale s to scale s−shift merges
  * runs of 2^shift adjacent buckets: normalized index nb sums original
  * buckets j with (offset+j) >> shift == nb (the reference's
  * arraySplit-at-divisible-index + arraySum, histogram.ts:368-424).
  *
  * The higher-order-function form (`transform(sequence(...), nb =>
  * aggregate(sequence(...), ...))`) is O(B²) per row in interpreted
  * lambdas — the measured hotspot of the exp-histogram quantile pipelines.
  * This expression is one O(B) fused loop inside whole-stage codegen.
  * Null bucket entries count as 0.
  */
case class DownscaleBuckets(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), LongType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"downscale_buckets requires (array<long>, long, int), " +
          s"got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "downscale_buckets"

  override def nullSafeEval(countsAny: Any, offsetAny: Any,
      shiftAny: Any): Any = {
    val counts = countsAny.asInstanceOf[ArrayData]
    val offset = offsetAny.asInstanceOf[Long]
    val shift = shiftAny.asInstanceOf[Int]
    val n = counts.numElements()
    if (n == 0 || shift == 0) {
      if (counts.numElements() > 0 && (0 until n).exists(counts.isNullAt)) {
        val arr = new Array[Long](n)
        var j = 0
        while (j < n) {
          if (!counts.isNullAt(j)) arr(j) = counts.getLong(j)
          j += 1
        }
        new GenericArrayData(arr)
      } else counts
    } else {
      val normOff = offset >> shift
      val normLast = (offset + n - 1) >> shift
      val arr = new Array[Long]((normLast - normOff + 1).toInt)
      var j = 0
      while (j < n) {
        if (!counts.isNullAt(j)) {
          arr((((offset + j) >> shift) - normOff).toInt) += counts.getLong(j)
        }
        j += 1
      }
      new GenericArrayData(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (counts, offset, shift) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val arr = ctx.freshName("arr")
      val normOff = ctx.freshName("normOff")
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $counts.numElements();
         |long $normOff = $offset >> $shift;
         |long[] $arr = new long[$n == 0 || $shift == 0 ? $n :
         |  (int) ((($offset + $n - 1) >> $shift) - $normOff + 1)];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$counts.isNullAt($j)) {
         |    if ($shift == 0) {
         |      $arr[$j] = $counts.getLong($j);
         |    } else {
         |      $arr[(int) ((($offset + $j) >> $shift) - $normOff)] +=
         |        $counts.getLong($j);
         |    }
         |  }
         |}
         |${ev.value} = new $gad($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): DownscaleBuckets =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BucketOps {
  /** Codegen'd exp-histogram bucket downscale: `counts` at `offset` merged
    * down by `shift` scale steps (see [[DownscaleBuckets]]). */
  def downscaleBuckets(counts: Column, offset: Column,
      shift: Column): Column =
    ColumnBridge.column(DownscaleBuckets(
      ColumnBridge.expression(counts.cast("array<long>")),
      ColumnBridge.expression(offset.cast("long")),
      ColumnBridge.expression(shift.cast("int"))))
}
