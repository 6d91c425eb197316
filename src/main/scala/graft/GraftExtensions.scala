package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions._

/** Catalyst integration point: registers the engine's native expressions as
  * SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works the
  * same as the Column API. Install via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * - cosine_sim(array<float>, array<float>) → double  (fused, codegen'd)
  * - simhash64(array<string>) → bigint
  * - minhash_sig(array<bigint>, numPerm, seed) → array<bigint>
  * - hyperplane_bands(array<float>, dim, bands, bits, seed) → array<bigint>
  * - rademacher_bands(array<float>, dim, bands, bits) → array<bigint>
  *   (the engine-portable ±1-plane twin — replayable in any md5-capable engine)
  * - nfc_normalize(string) → string  (Unicode NFC, codegen'd)
  * - topk_by_score(score, id, k) → array<struct<score,id>>  (aggregate)
  * - count_by_key(int) → map<int,bigint>  (aggregate; observe()-compatible)
  * - multi_pattern_hits(string, array<string> literal) → array<int>
  *   (one Aho–Corasick pass per row, pattern-count-independent)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  import GraftExtensions.{intLit, longLit}

  def apply(e: SparkSessionExtensions): Unit = {
    // Operator-optimization rule: derived-time predicates (unix_micros
    // chains) gain an equivalent raw-column conjunct the parquet scan can
    // prune row groups with — see DerivedTimeFilterPushdown's scaladoc.
    e.injectOptimizerRule(_ => graft.plans.DerivedTimeFilterPushdown)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashes, numPerm, seed) - MinHash signature"),
      (args: Seq[Expression]) => MinHashSignature(args(0),
        intLit(args(1), "numPerm"), longLit(args(2), "seed"))))
    e.injectFunction((FunctionIdentifier("hyperplane_bands"),
      info("hyperplane_bands",
        "hyperplane_bands(vec, dim, bands, bits, seed) - LSH band keys"),
      (args: Seq[Expression]) => HyperplaneBands(args(0),
        intLit(args(1), "dim"), intLit(args(2), "bands"),
        intLit(args(3), "bitsPerBand"), longLit(args(4), "seed"))))
    e.injectFunction((FunctionIdentifier("rademacher_bands"),
      info("rademacher_bands",
        "rademacher_bands(vec, dim, bands, bits) - portable (md5 ±1-plane) LSH band keys"),
      (args: Seq[Expression]) => RademacherBands(args(0),
        intLit(args(1), "dim"), intLit(args(2), "bands"),
        intLit(args(3), "bitsPerBand"))))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC canonicalization"),
      (args: Seq[Expression]) => NfcNormalize(args.head)))
    e.injectFunction((FunctionIdentifier("topk_by_score"),
      info("topk_by_score",
        "topk_by_score(score, id, k) - top-k (score,id) pairs per group, score desc"),
      (args: Seq[Expression]) => TopKByScore(args(0), args(1), intLit(args(2), "k"))))
    e.injectFunction((FunctionIdentifier("count_by_key"),
      info("count_by_key",
        "count_by_key(key) - per-key row counts as one map<int,bigint> aggregate"),
      (args: Seq[Expression]) => CountByKey(args.head)))
    e.injectFunction((FunctionIdentifier("multi_pattern_hits"),
      info("multi_pattern_hits",
        "multi_pattern_hits(text, array('p1','p2',...)) - sorted indexes of " +
          "patterns occurring as substrings (one Aho-Corasick pass)"),
      (args: Seq[Expression]) => MultiPatternHits(args(0),
        GraftExtensions.stringSeqLit(args(1), "patterns"))))
  }
}

object GraftExtensions {

  private[graft] def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
  private[graft] def longLit(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** A SQL array-of-string literal (array('a','b') or a foldable array
    * literal) as a Seq[String] — the pattern-set argument of
    * multi_pattern_hits must be fixed at plan time (the automaton compiles
    * once per plan, not per row). */
  private[graft] def stringSeqLit(e: Expression, what: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    e match {
      case CreateArray(children, _) => children.map {
        case Literal(s: UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"$what must be string literals, got $other")
      }
      case Literal(a: ArrayData, _) =>
        a.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.asInstanceOf[UTF8String].toString).toSeq
      case other => throw new IllegalArgumentException(
        s"$what must be an array literal, got $other")
    }
  }

  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DerivedTimeFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DerivedTimeFilterPushdown
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      args => CosineSimilarity(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      args => SimHash64(args.head), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize",
      args => NfcNormalize(args.head), "built-in")
    reg.createOrReplaceTempFunction("topk_by_score",
      args => TopKByScore(args(0), args(1), intLit(args(2), "k")), "built-in")
    reg.createOrReplaceTempFunction("rademacher_bands",
      args => RademacherBands(args(0), intLit(args(1), "dim"),
        intLit(args(2), "bands"), intLit(args(3), "bitsPerBand")), "built-in")
    reg.createOrReplaceTempFunction("count_by_key",
      args => CountByKey(args.head), "built-in")
    reg.createOrReplaceTempFunction("multi_pattern_hits",
      args => MultiPatternHits(args(0), stringSeqLit(args(1), "patterns")),
      "built-in")
  }
}
