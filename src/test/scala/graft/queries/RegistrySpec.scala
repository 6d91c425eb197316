package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Registry-wide smoke: every query builds and runs at sf0.001; every
  * oracle-checked query returns rows (a 0-row result would vacuously pass
  * the driver compare); names/columns follow the determinism conventions.
  */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("oracle keys are a subset of query keys") {
    val q = Registry.all.map(_.name).toSet
    assert(Registry.all.flatMap(x => x.oracle.map(_ => x.name)).toSet.subsetOf(q))
  }

  // Sketch-path queries may legitimately return zero rows at tiny scale;
  // everything with an oracle must produce data.
  private val mayBeEmpty = Set("t_minhash_pairs", "e_dup_pairs", "t_jaccard_pairs")

  Registry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001" + (if (q.oracle.isDefined) " with rows" else "")) {
      val n = q.build(spark, GraftTestSpark.sfDir).count()
      if (q.oracle.isDefined && !mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
