package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE inference: apply a FIXED learned merge list (rank order) to one
  * word — the production encoder half of [[graft.operators.BpeVocab]]
  * (whose scaladoc promises exactly this binding). The k greedy passes run
  * in tight Java loops inside ONE expression evaluation; the composed
  * alternative (k chained `aggregate` HOF folds) would be interpreted AND
  * k-deep per row — the WordShingles lesson squared.
  *
  * Initial symbols are per-CODE-POINT (Character.codePoints), matching the
  * `substring(word, i, 1)` slicing of BpeVocab.charSyms and the oracle's
  * `substr` — not per UTF-16 char, which would split surrogate pairs.
  * Each pass is the textbook greedy left-to-right merge, byte-identical to
  * [[graft.operators.BpeVocab.mergePair]]'s fold (BpeVocabSpec pins the
  * three-way equivalence with the plain-Scala encodeWord).
  *
  * The merge list rides in the expression — serialized once per task, not
  * per row — and is bounded (k merges), like NearestCentroids' matrix.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.simpleString}")
  }

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    var syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var n = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = word.substring(i, i + w)
      n += 1
      i += w
    }
    var len = n
    var m = 0
    while (m < mergeArr.length && len > 1) {
      val l = mergeArr(m)._1
      val r = mergeArr(m)._2
      val out = new Array[String](len)
      var outLen = 0
      var pending: String = null
      var j = 0
      while (j < len) {
        val s = syms(j)
        if (pending == null) pending = s
        else if (pending == l && s == r) { out(outLen) = l + r; outLen += 1; pending = null }
        else { out(outLen) = pending; outLen += 1; pending = s }
        j += 1
      }
      if (pending != null) { out(outLen) = pending; outLen += 1 }
      syms = out
      len = outLen
      m += 1
    }
    val res = new Array[AnyRef](len)
    var k = 0
    while (k < len) { res(k) = UTF8String.fromString(syms(k)); k += 1 }
    new GenericArrayData(res)
  }

  override def prettyName: String = "bpe_encode"

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeEncode {
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeEncode(ExpressionUtils.expression(word), merges))
}
