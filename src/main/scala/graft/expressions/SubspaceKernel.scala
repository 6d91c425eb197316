package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native fused per-SUBSPACE vector kernel over two `array<float>` columns:
  * squared L2 distance (`squaredL2 = true`) or dot product (`false`) of
  * the `subDim`-wide slice starting at element `j·subDim` — the inner
  * kernel of product quantization (ProductQuantizer), where it is
  * evaluated O(rows · m · nCodes) times per encode pass.
  *
  * Exists for the same reason as [[CosineSimilarity]]: the composed
  * `aggregate(sequence(...), ...)` higher-order form runs INTERPRETED per
  * element (measured ~4× on the PQ encode at sf0.1; the repo's rule is
  * that any O(rows·expansion) vector kernel uses a fused native
  * expression). `doGenCode` emits a plain Java loop inside whole-stage
  * codegen. Accumulation is index order with a 0.0 seed — bit-for-bit
  * the composed fold (property-tested in ProductQuantizerSpec), so
  * swapping never moves the e_pq_topk oracle.
  *
  * Out-of-range slices (j·subDim+subDim past either array's end) clamp to
  * the overlapping prefix, mirroring what element_at-with-null semantics
  * would surface loudly anyway — PQ configs must tile the dimension
  * exactly, enforced by the caller.
  */
case class SubspaceKernel(a: Expression, b: Expression, j: Expression,
    subDim: Int, squaredL2: Boolean) extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = j

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val arrOk = Seq(a, b).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (arrOk && j.dataType == IntegerType && subDim > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"subspace_kernel expects (array<float>, array<float>, int) with subDim > 0, got " +
        s"(${a.dataType.simpleString}, ${b.dataType.simpleString}, ${j.dataType.simpleString})")
  }

  override def nullSafeEval(av: Any, bv: Any, jv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val start = jv.asInstanceOf[Int] * subDim
    val end = math.min(start + subDim, math.min(x.numElements(), y.numElements()))
    var acc = 0.0
    var i = start
    while (i < end) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      if (squaredL2) { val d = xv - yv; acc += d * d } else acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, jj) => {
      val start = ctx.freshName("start")
      val end = ctx.freshName("end")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val body =
        if (squaredL2)
          s"double d = $xv - $yv; $acc += d * d;"
        else
          s"$acc += $xv * $yv;"
      s"""
         |int $start = $jj * $subDim;
         |int $end = java.lang.Math.min($start + $subDim,
         |  java.lang.Math.min($x.numElements(), $y.numElements()));
         |double $acc = 0.0;
         |for (int $i = $start; $i < $end; $i++) {
         |  double $xv = (double) $x.getFloat($i);
         |  double $yv = (double) $y.getFloat($i);
         |  $body
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(a = f, b = s, j = t)
}

object SubspaceKernel {
  /** Squared L2 of subspace `j` (slice [j·subDim, j·subDim+subDim)). */
  def l2(a: Column, b: Column, j: Column, subDim: Int): Column =
    ExpressionUtils.column(SubspaceKernel(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b), ExpressionUtils.expression(j),
      subDim, squaredL2 = true))

  /** Dot product of subspace `j`. */
  def dot(a: Column, b: Column, j: Column, subDim: Int): Column =
    ExpressionUtils.column(SubspaceKernel(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b), ExpressionUtils.expression(j),
      subDim, squaredL2 = false))
}
