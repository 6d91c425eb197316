package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash over an array of token strings.
  *
  * Classic Charikar scheme: each token is hashed; each bit position
  * accumulates +1/−1 by the token's bit; the sign vector is the fingerprint.
  * Near-duplicate docs land within a small Hamming distance — pair them with
  * `bit_count(a ^ b)` (built-in, codegen'd) after banding on 16-bit chunks.
  *
  * Two token-hash families:
  *
  *  - default (`portable = false`): 64-bit xxhash64 (Spark's native hash —
  *    consistent with the engine's other fingerprints), 64 fingerprint bits.
  *  - `portable = true`: the 60-bit md5-prefix hash of
  *    [[graft.functions.TextFunctions.portableHash60]] (value of the first
  *    15 hex chars of md5(token)), 60 fingerprint bits. Any engine with md5
  *    reproduces it, which upgrades the registry's simhash query from a
  *    rows-only check to a full DuckDB oracle. Costs one MD5 per token
  *    (~2-4× xxhash64) — the production family stays the default.
  */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${other.simpleString}")
    }

  private val width = if (portable) 60 else 64

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Int](width)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        val h =
          if (portable) SimHash64.md5Prefix60(tok.getBytes)
          else XxHash64Function.hash(tok, StringType, 42L)
        var b = 0
        while (b < width) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < width) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Value of the first 15 hex chars of md5(bytes) — bytes 0..6 plus the
    * high nibble of byte 7. Bit-identical to
    * [[graft.functions.TextFunctions.portableHash60]] on UTF-8 input
    * (PortableFamilySpec pins the equivalence). */
  private[expressions] def md5Prefix60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) >> 4) & 0xfL)
  }

  def apply(tokens: Column): Column = apply(tokens, portable = false)

  def apply(tokens: Column, portable: Boolean): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens), portable))
}
