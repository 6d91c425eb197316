package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Top-`nProbe` nearest coarse-quantizer centroids for an `array<float>`
  * embedding — the assignment kernel of an IVF index. Centroids are
  * L2-normalized at construction so nearest-by-cosine reduces to a dot
  * product; the matrix rides in the expression (serialized once per task,
  * not per row).
  */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty && nProbe >= 1)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val matrix: Array[Array[Double]] = centroids.map { c =>
    val a = c.toArray
    val n = math.sqrt(a.map(x => x * x).sum)
    if (n == 0.0) a else a.map(_ / n)
  }.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val k = math.min(nProbe, matrix.length)
    val scores = new Array[Double](matrix.length)
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      val n = math.min(v.numElements(), cent.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i) * cent(i); i += 1 }
      scores(c) = dot
      c += 1
    }
    val top = scores.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(k).map(_._2)
    new GenericArrayData(top)
  }

  override protected def withNewChildInternal(ch: Expression): Expression = copy(child = ch)
}

object NearestCentroids {
  def apply(vec: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    ExpressionUtils.column(
      NearestCentroids(ExpressionUtils.expression(vec), centroids, nProbe))
}
