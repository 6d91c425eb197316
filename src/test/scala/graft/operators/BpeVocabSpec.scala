package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** BPE vocabulary induction: the distributed merge loop must reproduce the
  * textbook sequential algorithm exactly — including the greedy
  * left-to-right order inside overlapping runs ("aaaa" under (a,a) →
  * ["aa","aa"], never ["a","aa","a"]) that both the aggregate-fold rewrite
  * AND the window-function oracle have to get right.
  */
class BpeVocabSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** One greedy left-to-right merge pass over a symbol sequence. */
  private def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var pending: String = null
    syms.foreach { s =>
      if (pending == null) pending = s
      else if (pending == l && s == r) { out += (l + r); pending = null }
      else { out += pending; pending = s }
    }
    if (pending != null) out += pending
    out.result()
  }

  /** Plain-Scala reference: word-freq table → k merges, sequential. */
  private def refMerges(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.toSeq.groupMapReduce(w => w._1.map(_.toString).toVector)(_._2)(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _            => ()
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, c))
        vocab = vocab.toSeq.groupMapReduce { case (syms, _) =>
          applyMerge(syms, l, r)
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def sparkMerges(docs: Seq[String], k: Int): Seq[(String, String, Long)] =
    BpeVocab.merges(spark, docs.toDF("text"), "text", k)
      .orderBy("rnk").as[(Long, String, String, Long)].collect().toSeq
      .map(t => (t._2, t._3, t._4))

  private def wordFreqsOf(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  test("merge sequence equals the sequential reference on a small corpus") {
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "wide wider widest",
      "low new low new lowest")
    val k = 6
    assert(sparkMerges(docs, k) === refMerges(wordFreqsOf(docs), k))
  }

  test("overlapping runs merge greedily left-to-right (the aaaa case)") {
    // Corpus engineered so the FIRST merge is (a,a): 'aaaa' must become
    // [aa, aa] (pair count 3 reads as 2 merged occurrences), and 'aaa'
    // [aa, a]. Verify through the second round's counts: if the fold
    // mis-merged, round 2's top pair differs from the reference.
    val docs = Seq("aaaa aaa aaaa", "aaaa b b", "aaa aaaa")
    assert(sparkMerges(docs, 3) === refMerges(wordFreqsOf(docs), 3))
    // and the first merge really is (a,a)
    assert(sparkMerges(docs, 1).head._1 === "a")
    assert(sparkMerges(docs, 1).head._2 === "a")
  }

  test("encodeWord replays the training rewrite (round-trip)") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    assert(BpeVocab.encodeWord("lower", merges) === Seq("low", "er"))
    assert(BpeVocab.encodeWord("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    assert(BpeVocab.encodeWord("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
  }

  test("native BpeEncode kernel == encodeWord on every trained-corpus word") {
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "aaaa aaa banana bandana")
    val merges = sparkMerges(docs, 5).map(t => (t._1, t._2))
    val words = wordFreqsOf(docs).keys.toSeq.sorted
    val got = words.toDF("word")
      .select(col("word"), graft.expressions.BpeEncode(col("word"), merges).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(got(w) === BpeVocab.encodeWord(w, merges), s"word=$w merges=$merges")
    }
  }

  test("encodeTokens conserves occurrence-weighted token mass") {
    val docs = Seq("low lower lowest low low", "new newer newest new")
    val merges = sparkMerges(docs, 4).map(t => (t._1, t._2))
    val counts = BpeVocab.encodeTokens(docs.toDF("text"), "text", merges)
      .as[(String, Long)].collect().toMap
    val expected = scala.collection.mutable.Map[String, Long]()
    wordFreqsOf(docs).foreach { case (w, f) =>
      BpeVocab.encodeWord(w, merges).foreach { t =>
        expected(t) = expected.getOrElse(t, 0L) + f
      }
    }
    assert(counts === expected.toMap)
  }

  test("merge counts are frequency-weighted, not type-weighted") {
    // 'ab' occurs 5 times as one word type; 'cd' in two types once each.
    // (a,b) count 5 must beat (c,d) count 2.
    val docs = Seq("ab ab ab ab ab", "cd", "cdx")
    val got = sparkMerges(docs, 1)
    assert(got.head === (("a", "b", 5L)))
  }
}
