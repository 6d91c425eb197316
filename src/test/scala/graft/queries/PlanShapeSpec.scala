package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The 100 TB design properties are PLAN properties — pin them as tests so
  * a regression that keeps results correct but wrecks the scale shape
  * (a filter that stops pushing, a dimension that stops broadcasting, a
  * top-N that becomes a global sort, a join that degrades to a cartesian)
  * fails the suite, not just the bench.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def plan(name: String): String =
    Registry.byName(name).build(spark, GraftTestSpark.sfDir)
      .queryExecution.executedPlan.toString

  test("filters reach the parquet scans (pushdown)") {
    Seq("q1_pricing", "q3_shipping", "q5_region_rev").foreach { q =>
      val p = plan(q)
      assert(p.contains("PushedFilters: [Is") || p.contains("PushedFilters: [Equal"),
        s"$q: no pushed filters in\n$p")
    }
  }

  test("no query plans a cartesian or nested-loop join except the brute-force baselines") {
    val exempt = Set("e_cosine_topk", "e_label_stats", "e_dup_pairs_exact")
    Registry.all.filterNot(q => exempt(q.name)).foreach { q =>
      val p = plan(q.name)
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian join")
    }
  }

  test("dimension joins broadcast (q5 star chain, type decode)") {
    assert(plan("q5_region_rev").contains("BroadcastHashJoin"))
    assert(plan("h_type_decode").contains("BroadcastHashJoin"))
  }

  test("top-N queries avoid a global sort (TakeOrderedAndProject)") {
    Seq("q_sort_limit", "q3_shipping", "e_cosine_topk").foreach { q =>
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"$q: top-N should be TakeOrderedAndProject, not a global sort")
    }
  }

  test("column pruning: q1 scans only the aggregated lineitem columns") {
    val p = plan("q1_pricing")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // identity keys are not part of the aggregate — pruned at the scan
    assert(readSchema.contains("l_returnflag") && !readSchema.contains("l_orderkey"),
      s"unexpected ReadSchema: $readSchema")
  }

  test("similarity join shuffles band keys, not a cross product") {
    val p = plan("e_knn_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "LSH knn must stay an equi-join on band keys")
  }
}
