package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Clamped-seed majority label propagation: labels must flood a chain one
  * hop per round, seeds must never flip, vote ties must fall to the
  * lexicographically smaller label, unreached nodes must stay unlabeled,
  * and none of it may depend on partitioning. */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[(Long, String)],
      rounds: Int, parts: Int = 4): Map[Long, String] =
    LabelProp.propagate(
      edges.toDF("a_id", "b_id").repartition(parts),
      seeds.toDF("doc_id", "label").repartition(parts), rounds)
      .as[(Long, String)].collect().toMap

  test("labels flood a chain one hop per round") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = Seq(1L -> "a")
    assert(run(chain, seeds, 1) === Map(1L -> "a", 2L -> "a"))
    assert(run(chain, seeds, 2) === Map(1L -> "a", 2L -> "a", 3L -> "a"))
    assert(run(chain, seeds, 4) ===
      Map(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "a", 5L -> "a"))
  }

  test("seeds are clamped against any majority") {
    // node 1 is a seed 'a' surrounded by three 'b' seeds
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val seeds = Seq(1L -> "a", 2L -> "b", 3L -> "b", 4L -> "b")
    val got = run(edges, seeds, 3)
    assert(got(1L) === "a")
  }

  test("majority wins; exact ties fall to the smaller label") {
    // node 0 hears b,b,a -> b; node 9 hears one a and one b -> a
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (9L, 4L), (9L, 5L))
    val seeds = Seq(1L -> "b", 2L -> "b", 3L -> "a", 4L -> "b", 5L -> "a")
    val got = run(edges, seeds, 1)
    assert(got(0L) === "b")
    assert(got(9L) === "a")
  }

  test("disconnected nodes never acquire a label") {
    val edges = Seq((1L, 2L), (7L, 8L))
    val seeds = Seq(1L -> "a")
    val got = run(edges, seeds, 5)
    assert(!got.contains(7L) && !got.contains(8L))
    assert(got === Map(1L -> "a", 2L -> "a"))
  }

  test("non-seed labels are recomputed each round (synchronous), not frozen") {
    // star: center 0 initially hears only 'a'; once 'b' seeds flood their
    // side, the round-2 majority at 0 flips to 'b'
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (2L, 20L), (3L, 30L))
    val seeds = Seq(1L -> "a", 20L -> "b", 30L -> "b")
    val r1 = run(edges, seeds, 1)
    assert(r1(0L) === "a") // only node 1 is labeled yet among 0's neighbors
    val r2 = run(edges, seeds, 2)
    assert(r2(0L) === "b") // now 2 and 3 carry 'b': majority 2-1
  }

  test("partition-count invariant") {
    val rnd = new scala.util.Random(31)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).filter(e => e._1 != e._2)
    val seeds = (0 until 20).map(i => (i * 4).toLong -> (if (i % 2 == 0) "x" else "y"))
    assert(run(edges, seeds, 3, parts = 1) === run(edges, seeds, 3, parts = 23))
  }
}
