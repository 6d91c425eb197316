package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term frequencies in ONE tokenization pass:
  * `array<struct<term string, tf bigint>>` over the whitespace tokens of
  * the (caller-lowered) input — byte-identical token semantics to
  * `TextFunctions.tokens` (`split(trim(text), "\s+")`: UTF8String 0x20
  * trim, Java-regex split keeping empty tokens).
  *
  * This is the shuffle-elimination kernel for per-document term counting:
  * `explode(term_counts(lower(text)))` produces exactly the rows of
  * `explode(tokens(...)).groupBy(doc_id, term).count()` — but as a pure
  * map over the corpus. The groupBy form hash-exchanges the FULL postings
  * relation (~tokens-sized) only to aggregate groups that never span two
  * rows, because the grouping key contains the row's own doc_id; at 500 k
  * docs that exchange-plus-aggregate measured 7× per decade
  * (RetrievalIndex build) while this form stays scan-speed. Output order
  * is first occurrence — deterministic per row, independent of
  * partitioning.
  *
  * Terms are counted into an open-addressing pass over a per-row HashMap
  * (O(tokens) per row, state O(distinct terms of ONE doc) — bounded by
  * the row, never the corpus).
  */
case class TermCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_counts expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val trimmed = input.asInstanceOf[UTF8String].trim().toString
    val toks = TermCounts.Whitespace.split(trimmed, -1)
    // first-occurrence order: LinkedHashMap iteration is insertion order
    val counts = new java.util.LinkedHashMap[String, java.lang.Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val c = counts.get(t)
      counts.put(t, if (c == null) 1L else c + 1L)
      i += 1
    }
    val out = new Array[AnyRef](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey), e.getValue.longValue())
      j += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "term_counts"

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TermCounts {
  private val Whitespace = Pattern.compile("\\s+")

  def apply(text: Column): Column =
    ExpressionUtils.column(TermCounts(ExpressionUtils.expression(text)))
}
