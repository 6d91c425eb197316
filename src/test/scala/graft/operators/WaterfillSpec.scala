package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Waterfill.allocate invariants: budget conservation, per-source caps,
  * max-min fairness, and the degenerate branches (budget >= total, budget
  * smaller than the source count). */
class WaterfillSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def alloc(census: Seq[(String, Long)], budget: Long) =
    Waterfill.allocate(census.toDF("src", "avail"), "src", "avail", lit(budget))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

  test("allocations sum to the budget and never exceed avail") {
    val census = Seq(("a", 100L), ("b", 10L), ("c", 50L), ("d", 7L))
    for (b <- Seq(1L, 7L, 20L, 60L, 100L, 166L)) {
      val out = alloc(census, b)
      assert(out.map(_._3).sum == math.min(b, 167L), s"budget $b")
      out.foreach { case (s, av, al) =>
        assert(al >= 0 && al <= av, s"budget $b source $s")
      }
    }
  }

  test("budget >= total hands every source its full avail") {
    val out = alloc(Seq(("a", 3L), ("b", 5L)), 100L)
    assert(out.toSeq == Seq(("a", 3L, 3L), ("b", 5L, 5L)))
  }

  test("max-min fairness: capped sources land within one unit of each other, " +
    "and no uncapped source exceeds any capped allocation") {
    val out = alloc(Seq(("a", 100L), ("b", 10L), ("c", 50L), ("d", 7L)), 60L)
    // level T = (60-17)/2 = 21, rem 1 → a,c capped at 21/22, b,d full.
    val m = out.map(t => t._1 -> t._3).toMap
    assert(m("b") == 10L && m("d") == 7L)
    assert(Set(m("a"), m("c")) == Set(21L, 22L))
    // remainder goes to the lexicographically first capped source
    assert(m("a") == 22L)
  }

  test("budget smaller than the source count still conserves exactly") {
    val out = alloc(Seq(("a", 9L), ("b", 9L), ("c", 9L)), 2L)
    assert(out.map(_._3).sum == 2L)
    assert(out.map(_._3).max <= 1L) // level 0 + two remainder units
  }
}
