package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** PageRank's exactness contract: a fixed iteration count in integer
  * fixed-point arithmetic must reproduce an independent scalar reference
  * BIT-for-bit, regardless of edge-row order or partitioning. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** Scalar replay of the exact integer recurrence (the oracle's math,
    * written without Spark): floor divisions on longs, exact sums. */
  private def reference(nodes: Seq[String], edges: Seq[(String, String, Long)],
      k: Int): Map[String, Long] = {
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank = nodes.map(_ -> 1000000000L).toMap
    (1 to k).foreach { _ =>
      val inc = edges
        .groupBy(_._2).view
        .mapValues(_.map { case (u, _, w) => rank.getOrElse(u, 0L) * w / outW(u) }.sum)
        .toMap
      rank = nodes.map(v => v -> (150000000L + 85L * inc.getOrElse(v, 0L) / 100L)).toMap
    }
    rank
  }

  private val nodes = Seq("a", "b", "c", "d", "e", "f")
  private val edges = Seq(
    ("a", "b", 3L), ("b", "a", 3L), ("a", "c", 1L), ("c", "a", 1L),
    ("b", "c", 2L), ("c", "b", 2L), ("e", "a", 5L), ("a", "e", 5L),
    ("d", "a", 1L)) // d points in but nothing points at d; f is isolated

  private def run(es: Seq[(String, String, Long)], k: Int = 10): Map[String, Long] =
    PageRank.ranks(nodes.toDF("source"), "source",
        es.toDF("src", "dst", "w"), "src", "dst", "w", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("matches the scalar integer reference exactly (10 iterations)") {
    assert(run(edges) === reference(nodes, edges, 10))
  }

  test("isolated and in-edge-only nodes settle at the base rank") {
    val got = run(edges)
    assert(got("f") === 150000000L) // no edges at all
    assert(got("d") === 150000000L) // out-edges only: contributes, receives nothing
    // the hub outranks everything it feeds
    assert(got("a") > got("b") && got("a") > got("e"))
  }

  test("edge order and partitioning never change a single bit") {
    val base = run(edges)
    assert(run(scala.util.Random.shuffle(edges)) === base)
    val repart = PageRank.ranks(nodes.toDF("source").repartition(7), "source",
        edges.toDF("src", "dst", "w").repartition(5), "src", "dst", "w", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(repart === base)
  }

  test("ranksConverged settles near the fixpoint and reports its round count") {
    val (df, iters) = PageRank.ranksConverged(nodes.toDF("source"), "source",
      edges.toDF("src", "dst", "w"), "src", "dst", "w", tolE9 = 1000L)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(iters >= 1 && iters < 50)
    // distance to the true fixpoint is bounded by tol·d/(1−d) ≈ 5.67·tol;
    // 40 exact iterations is far past settling on this 6-node graph
    val fix = reference(nodes, edges, 40)
    nodes.foreach { v =>
      assert(math.abs(got(v) - fix(v)) <= 6000L,
        s"$v: converged ${got(v)} vs fixpoint ${fix(v)}")
    }
  }

  test("ranksConverged refuses when the round budget is too small") {
    intercept[IllegalArgumentException] {
      PageRank.ranksConverged(nodes.toDF("source"), "source",
        edges.toDF("src", "dst", "w"), "src", "dst", "w",
        tolE9 = 0L, maxIter = 1)
    }
  }

  test("one iteration distributes exactly one round of mass") {
    // single edge a->b, w=1: b gets 150000000 + 85*1e9/100; a the base
    val got = run(Seq(("a", "b", 1L)), k = 1)
    assert(got("a") === 150000000L)
    assert(got("b") === 150000000L + 85L * 1000000000L / 100L)
  }
}
