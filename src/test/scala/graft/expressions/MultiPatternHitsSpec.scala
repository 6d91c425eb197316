package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The Aho–Corasick scan must equal the brute-force
  * `filter(patterns, p -> contains(text, p))` EXACTLY — the automaton is a
  * performance shape, never a semantics change. The battery leans on the
  * classic traps: suffix outputs (a match ending inside a longer pattern's
  * spine), overlapping matches, patterns that are prefixes/suffixes of each
  * other, and fail-link chains through the root. */
class MultiPatternHitsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def bruteHits(text: String, patterns: Seq[String]): Seq[Int] =
    patterns.zipWithIndex.collect {
      case (p, i) if text.contains(p) => i
    }

  private def acHits(texts: Seq[String], patterns: Seq[String]): Map[String, Seq[Int]] =
    texts.toDF("t")
      .select(col("t"), MultiPatternHits(col("t"), patterns).as("h"))
      .as[(String, Seq[Int])].collect().toMap
      .map { case (k, v) => k -> v.toSeq }

  test("classic trap battery: suffix outputs, overlaps, nested patterns") {
    val patterns = Seq("he", "she", "his", "hers", "a", "aa", "aaa", "ab", "b", "bc")
    val texts = Seq("ushers", "aaa", "abc", "", "x", "shis", "hehehe", "baaab")
    val got = acHits(texts.distinct, patterns)
    texts.distinct.foreach { t =>
      assert(got(t) === bruteHits(t, patterns), s"text '$t'")
    }
    // spot-check the suffix-merge case explicitly: "ushers" contains
    // she (via the s-h-e spine), he (suffix output of she), hers
    assert(got("ushers") === Seq(0, 1, 3))
  }

  test("randomized equivalence with planted occurrences") {
    val rnd = new scala.util.Random(17)
    val alpha = "abc"
    def fresh(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(3))).mkString
    val patterns = (0 until 40).map(_ => fresh(1 + rnd.nextInt(5))).distinct
    val texts = (0 until 200).map { _ =>
      val base = fresh(rnd.nextInt(30))
      if (rnd.nextBoolean() && base.nonEmpty) {
        val p = patterns(rnd.nextInt(patterns.size))
        val at = rnd.nextInt(base.length)
        base.take(at) + p + base.drop(at)
      } else base
    }.distinct
    val got = acHits(texts, patterns)
    texts.foreach { t => assert(got(t) === bruteHits(t, patterns), s"text '$t'") }
  }

  test("null text yields null; result ids are sorted and distinct") {
    val df = Seq(Some("abab"), None).toDF("t")
      .select(MultiPatternHits(col("t"), Seq("ab", "ba", "abab")).as("h"))
    val rows = df.collect()
    assert(rows.map(r => Option(r.get(0))).count(_.isEmpty) == 1)
    val hits = df.filter(col("h").isNotNull).as[Seq[Int]].head()
    assert(hits === hits.distinct.sorted)
    assert(hits === Seq(0, 1, 2))
  }

  test("loud contracts: empty pattern set, empty pattern") {
    intercept[IllegalArgumentException] {
      MultiPatternHits(col("t"), Nil)
    }
    intercept[IllegalArgumentException] {
      MultiPatternHits(col("t"), Seq("a", ""))
    }
  }

  test("unicode: multi-byte patterns match in code-unit space") {
    val patterns = Seq("héllo", "wörld", "日本")
    val texts = Seq("say héllo to the wörld", "日本語のテキスト", "plain ascii")
    val got = acHits(texts, patterns)
    texts.foreach { t => assert(got(t) === bruteHits(t, patterns)) }
  }
}
