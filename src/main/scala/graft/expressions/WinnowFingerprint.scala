package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): roll a polynomial hash over character k-grams, then
  * keep the minimum hash of every window of `w` consecutive k-gram hashes
  * (rightmost-min tie rule), deduplicated. Guarantees any shared substring
  * of length ≥ w+k−1 between two documents yields a shared fingerprint —
  * the substring-robust complement to MinHash's bag-of-shingles view.
  *
  * Output is a sorted distinct `array<long>`; overlap of two docs'
  * fingerprint sets (e.g. `array_intersect`) localizes shared passages.
  * One pass, O(n) per row, no shuffle.
  */
case class WinnowFingerprint(child: Expression, k: Int, window: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && window > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint expects string, got ${other.simpleString}")
    }

  private val Base = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])

    // rolling polynomial hash over char k-grams
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    val grams = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    grams(0) = h
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * pow) * Base + s.charAt(i)
      grams(i - k + 1) = h
      i += 1
    }

    // winnow: rightmost minimum of each w-window (dedup via position check)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var lastPos = -1
    var start = 0
    val m = grams.length
    while (start + window <= m || (start == 0 && m < window)) {
      val end = math.min(start + window, m)
      var minPos = start
      var j = start + 1
      while (j < end) { if (grams(j) <= grams(minPos)) minPos = j; j += 1 }
      if (minPos != lastPos) { out += grams(minPos); lastPos = minPos }
      if (m < window) start = m // single short window: done
      else start += 1
    }
    new GenericArrayData(out.distinct.sorted.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowFingerprint {
  def apply(text: Column, k: Int = 8, window: Int = 16): Column =
    ExpressionUtils.column(WinnowFingerprint(ExpressionUtils.expression(text), k, window))
}
