package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The segment-pigeonhole edit join must equal the brute-force cross join
  * EXACTLY (the pigeonhole guarantee is completeness — a missed pair is a
  * correctness bug, not a recall trade), at every k, under any
  * partitioning, including the degenerate tiny-string buckets. */
class FuzzyLinkSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** Random strings over a small alphabet plus explicit perturbations of
    * earlier strings — guarantees the corpus actually CONTAINS pairs at
    * several distances (a random-only corpus at this size would test the
    * empty result). */
  private def corpus(n: Int, seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcd"
    def fresh(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(4))).mkString
    val out = scala.collection.mutable.ArrayBuffer[String]()
    (0 until n).foreach { i =>
      if (i > 0 && rnd.nextInt(3) == 0) {
        // perturb an earlier string with 1-3 random edits
        var s = out(rnd.nextInt(out.size))
        (0 until 1 + rnd.nextInt(3)).foreach { _ =>
          val p = if (s.isEmpty) 0 else rnd.nextInt(s.length)
          rnd.nextInt(3) match {
            case 0 if s.nonEmpty => s = s.take(p) + s.drop(p + 1) // delete
            case 1 => s = s.take(p) + alpha(rnd.nextInt(4)) + s.drop(p) // insert
            case _ if s.nonEmpty =>
              s = s.take(p) + alpha(rnd.nextInt(4)) + s.drop(p + 1) // subst
            case _ => s = alpha(rnd.nextInt(4)).toString
          }
        }
        out += s
      } else out += fresh(1 + rnd.nextInt(10))
    }
    out.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toSeq
  }

  private def brute(left: Seq[(Long, String)], right: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for ((qi, q) <- left; (ri, r) <- right; d = lev(q, r) if d <= k)
      yield (qi, ri, d)).toSet
  }

  private def run(left: Seq[(Long, String)], right: Seq[(Long, String)],
      k: Int, parts: Int = 4): Set[(Long, Long, Int)] =
    FuzzyLink.editJoin(
        left.toDF("qid", "q").repartition(parts), "qid", "q",
        right.toDF("rid", "r").repartition(parts), "rid", "r", k)
      .select(col("qid"), col("rid"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet

  test("equals brute force at k=1 and k=2 (completeness + exactness)") {
    val l = corpus(120, seed = 7)
    val r = corpus(120, seed = 19)
    for (k <- Seq(1, 2)) {
      val expect = brute(l, r, k)
      assert(expect.nonEmpty, "battery must exercise non-empty results")
      assert(expect.exists(_._3 == k), s"battery must contain dist-$k pairs")
      assert(run(l, r, k) === expect)
    }
  }

  test("k=3 and self-join shape (dist 0 self pairs included)") {
    val c = corpus(60, seed = 31)
    val expect = brute(c, c, 3)
    assert(run(c, c, 3) === expect)
    assert(c.forall { case (i, _) => expect.contains((i, i, 0)) })
  }

  test("tiny strings (length <= k) route through the empty-segment bucket") {
    val l = Seq((1L, "a"), (2L, ""), (3L, "ab"), (4L, "xyz"))
    val r = Seq((10L, "b"), (11L, "a"), (12L, ""), (13L, "abc"))
    for (k <- Seq(1, 2)) assert(run(l, r, k) === brute(l, r, k))
  }

  test("partition invariance") {
    val l = corpus(80, seed = 5)
    val r = corpus(80, seed = 6)
    assert(run(l, r, 2, parts = 1) === run(l, r, 2, parts = 32))
  }

  test("hotKeyCap drops only pairs reachable through hot keys (recall trade, never extras)") {
    // 30 strings sharing one hot segment + a cold cluster
    val hot = (0 until 30).map(i => (i.toLong, s"aaaa$i"))
    val cold = Seq((100L, "zzzz"), (101L, "zzzy"))
    val r = hot ++ cold
    val capped = run(cold ++ hot.take(2), r, 1) // uncapped baseline
    val withCap = FuzzyLink.editJoin(
        (cold ++ hot.take(2)).toDF("qid", "q"), "qid", "q",
        r.toDF("rid", "r"), "rid", "r", 1, hotKeyCap = Some(5))
      .select(col("qid"), col("rid"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(withCap.subsetOf(capped), "cap must never add pairs")
    assert(withCap.exists { case (q, rr, _) => q == 100L && rr == 101L },
      "cold pairs must survive the cap")
  }

  test("loud contracts") {
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      FuzzyLink.editJoin(df, "id", "s", df, "id", "s", k = 0)
    }
    intercept[IllegalArgumentException] {
      FuzzyLink.editJoin(df, "id", "s", df, "id", "s", k = 4)
    }
    intercept[IllegalArgumentException] {
      FuzzyLink.editJoin(df, "id", "s", df, "id", "s", 1, hotKeyCap = Some(0))
    }
  }
}
