package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelationalOps._

/** Property-based invariants (ScalaCheck generators, deterministic seeds):
  * the algebraic contracts the engine's kernels must satisfy regardless of
  * data shape — dedup idempotence and count bounds, upsert key semantics,
  * exact-sum partition invariance, MinHash-vs-true-jaccard agreement.
  */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** Deterministic sample stream from a generator. */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val keyedRows: Gen[List[(Int, Int)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 15), Gen.choose(0, 1000)))

  test("dedup is idempotent and bounded: |dedup(x)| = |keys(x)|, dedup∘dedup = dedup") {
    for (rows <- samples(keyedRows, 5) if rows.nonEmpty) {
      val df = rows.toDF("k", "v")
      val once = dedupKeepFirst(df, Seq("k"), Seq(col("v"), col("k")))
      val twice = dedupKeepFirst(once, Seq("k"), Seq(col("v"), col("k")))
      val onceRows = once.as[(Int, Int)].collect().toSet
      assert(onceRows.size === rows.map(_._1).distinct.size)
      assert(twice.as[(Int, Int)].collect().toSet === onceRows)
      // survivor is the minimum by order within each key
      val expected = rows.groupBy(_._1).view.mapValues(_.minBy(r => (r._2, r._1))).values.toSet
      assert(onceRows === expected)
    }
  }

  test("duplicateGroups reports exactly the keys with multiplicity > 1") {
    for (rows <- samples(keyedRows, 5) if rows.nonEmpty) {
      val groups = duplicateGroups(rows.toDF("k", "v"), Seq("k"))
        .as[(Int, Long)].collect().map(g => g._1 -> g._2).toMap
      val expected = rows.groupBy(_._1).filter(_._2.size > 1).view.mapValues(_.size.toLong).toMap
      assert(groups === expected)
    }
  }

  test("upsert: result keys = state keys ∪ update keys; updates win") {
    val kv = Gen.listOfN(20, Gen.zip(Gen.choose(0, 10), Gen.choose(0, 100)))
    for ((stateRows, updateRows) <- samples(Gen.zip(kv, kv), 5)) {
      val state = stateRows.distinctBy(_._1).toDF("k", "v")
      val updates = updateRows.distinctBy(_._1).toDF("k", "v")
      val got = upsert(state, updates, "k").as[(Int, Int)].collect().toMap
      val expected = stateRows.distinctBy(_._1).toMap ++ updateRows.distinctBy(_._1).toMap
      assert(got === expected)
    }
  }

  test("exactSum is invariant under permutation and partitioning") {
    val gen = Gen.zip(Gen.listOfN(100, Gen.choose(-10000, 10000).map(_ / 100.0)),
      Gen.choose(1, 16))
    for ((vals, parts) <- samples(gen, 5) if vals.nonEmpty) {
      val a = vals.toDF("v").repartition(parts).agg(exactSum(col("v"))).first().getDouble(0)
      val b = new scala.util.Random(7).shuffle(vals).toDF("v").coalesce(1)
        .agg(exactSum(col("v"))).first().getDouble(0)
      assert(a === b)
    }
  }

  test("MinHash signature agreement estimates true jaccard within tolerance") {
    import graft.dedup.TextDedup
    val vocab = ('a' to 'z').map(_.toString)
    def text(words: Seq[Int]) = words.map(w => vocab(w % 26)).mkString(" ")
    val gen = Gen.zip(Gen.listOfN(60, Gen.choose(0, 25)), Gen.choose(5, 40))
    for ((base, keep) <- samples(gen, 5)) {
      val t1 = text(base)
      val t2 = text(base.take(keep) ++ base.drop(keep).map(_ + 1)) // mutate tail
      val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      val cfg = TextDedup.MinHashConfig(numPerm = 128, bands = 32)
      val sigs = TextDedup.signatures(docs, "doc_id", "text", cfg)
        .select("doc_id", "sig", "sh").collect()
      val s1 = sigs.find(_.getLong(0) == 1L).get
      val s2 = sigs.find(_.getLong(0) == 2L).get
      val est = s1.getSeq[Long](1).zip(s2.getSeq[Long](1)).count(p => p._1 == p._2) / 128.0
      val sh1 = s1.getSeq[Long](2).toSet
      val sh2 = s2.getSeq[Long](2).toSet
      val trueJ = (sh1 & sh2).size.toDouble / (sh1 | sh2).size
      assert(math.abs(est - trueJ) <= 0.25, s"est=$est true=$trueJ")
    }
  }

  private val edgeLists: Gen[List[(Long, Long)]] =
    Gen.listOfN(80, Gen.zip(Gen.choose(0L, 39L), Gen.choose(0L, 39L)))

  test("connected components = union-find fixpoint on random graphs") {
    for (edges <- samples(edgeLists, 4) if edges.exists(e => e._1 != e._2)) {
      val got = graft.dedup.ConnectedComponents
        .components(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      // independent union-find (shared reference); every edge endpoint gets
      // a label — self-loop-only nodes are their own component.
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val labels = UnionFindRef.minLabels(nodes, edges)
      val want = nodes.map(n => n -> labels(n)).toMap
      assert(got === want)
    }
  }
}
