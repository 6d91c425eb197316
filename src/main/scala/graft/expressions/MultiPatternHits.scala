package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Which of a fixed pattern set occur as SUBSTRINGS of the row's text —
  * the multi-pattern scan behind blocklist filtering, PII-term scanning,
  * and contamination probes when the pattern list is large.
  *
  * The naive form is p `contains` probes per row — O(p · |text|), and at
  * thousands of patterns it is the operator that dies first (a regex
  * alternation compiles to the same backtracking scan). This expression
  * runs the classic Aho–Corasick automaton (public-domain algorithm,
  * Aho & Corasick 1975): the pattern set compiles ONCE per task into a
  * goto/fail/output trie, and each row is a single O(|text| + hits) walk
  * regardless of pattern count. The automaton is driver-built state
  * carried inside the expression — the broadcast-dimension discipline,
  * same as the trained-weight joins.
  *
  * Returns the SORTED DISTINCT indexes (into the constructor's pattern
  * seq) of every pattern that occurs — exactly
  * `filter(patterns, p -> contains(text, p))` by construction, which is
  * what the DuckDB oracles replay and MultiPatternHitsSpec pins against
  * the brute-force form. Matching is code-unit exact (no case folding —
  * lower upstream if needed); empty patterns are rejected loudly (an
  * empty needle "matches" everywhere and means a bug upstream).
  */
case class MultiPatternHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.size <= 1000000,
    "pattern set above 1M entries — shard the blocklist")
  require(patterns.forall(_.nonEmpty), "empty patterns are not allowed")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_hits expects string, got ${other.simpleString}")
  }

  @transient private lazy val automaton = MultiPatternHits.Automaton(patterns)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(automaton.scan(text))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "multi_pattern_hits"
}

object MultiPatternHits {

  def apply(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      MultiPatternHits(ExpressionUtils.expression(text), patterns))

  /** Aho–Corasick goto/fail/output automaton over Java chars (UTF-16 code
    * units — both the needle and the haystack are walked in the same
    * units, so matching equals String.contains exactly). */
  final class Automaton private[MultiPatternHits] (
      gotoMaps: Array[java.util.HashMap[Character, Integer]],
      fail: Array[Int],
      out: Array[Array[Int]]) extends Serializable {

    /** Sorted distinct pattern indexes occurring in `text`. */
    def scan(text: String): Array[Int] = {
      val seen = new java.util.BitSet()
      var state = 0
      var i = 0
      while (i < text.length) {
        val c = Character.valueOf(text.charAt(i))
        var g = gotoMaps(state).get(c)
        while (g == null && state != 0) {
          state = fail(state)
          g = gotoMaps(state).get(c)
        }
        if (g != null) state = g.intValue()
        val hits = out(state)
        var j = 0
        while (j < hits.length) { seen.set(hits(j)); j += 1 }
        i += 1
      }
      val res = new Array[Int](seen.cardinality())
      var k = 0
      var b = seen.nextSetBit(0)
      while (b >= 0) { res(k) = b; k += 1; b = seen.nextSetBit(b + 1) }
      res
    }
  }

  def Automaton(patterns: Seq[String]): Automaton = {
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outSets = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var state = 0
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        val next = gotoMaps(state).get(c)
        if (next == null) {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          outSets += scala.collection.mutable.ArrayBuffer.empty[Int]
          gotoMaps(state).put(c, Integer.valueOf(gotoMaps.size - 1))
          state = gotoMaps.size - 1
        } else state = next.intValue()
        i += 1
      }
      outSets(state) += idx
    }
    // BFS fail links; merge fail-state outputs so scan() reads one array
    val n = gotoMaps.size
    val fail = new Array[Int](n)
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach { (_, s) => fail(s) = 0; queue.add(s) }
    while (!queue.isEmpty) {
      val r = queue.poll().intValue()
      gotoMaps(r).forEach { (c, s) =>
        queue.add(s)
        var f = fail(r)
        while (gotoMaps(f).get(c) == null && f != 0) f = fail(f)
        val g = gotoMaps(f).get(c)
        fail(s.intValue()) =
          if (g != null && g.intValue() != s.intValue()) g.intValue() else 0
        outSets(s.intValue()) ++= outSets(fail(s.intValue()))
      }
    }
    new Automaton(gotoMaps.toArray, fail,
      outSets.map(_.toArray.sorted).toArray)
  }
}
