package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** Quality contract of the spherical k-means the e_kmeans oracle can't
  * see: it byte-checks the iterations, not that they CLUSTER — planted
  * structure recovery, Lloyd's objective monotonicity, determinism under
  * partitioning, and the k=1 edge.
  */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, GraftTestSpark.sfDir, "embeddings").cache()

  test("recovers two planted orthogonal clusters") {
    val rows = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, Array(1.0f, 0.01f * i, 0.02f, 0.0f))
      else (i.toLong, Array(0.01f * i, 1.0f, 0.0f, 0.02f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val fit = KMeans.fit(df, "vec_id", "embedding", KMeans.Config(k = 2, iterations = 3))
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    val evens = (0 until 20 by 2).map(i => fit(i.toLong)).toSet
    val odds = (1 until 20 by 2).map(i => fit(i.toLong)).toSet
    assert(evens.size === 1, s"even rows split: $evens")
    assert(odds.size === 1, s"odd rows split: $odds")
    assert(evens !== odds)
  }

  test("mean assigned cosine is non-decreasing across Lloyd's rounds") {
    val objs = (0 to 4).map { iters =>
      val cent = KMeans.centroids(emb, "vec_id", "embedding",
        KMeans.Config(k = 8, iterations = iters))
      KMeans.assign(emb, "vec_id", "embedding", cent)
        .agg(avg(col("score"))).as[Double].first()
    }
    // exact Lloyd's is monotone; the 1e-9 grid + 6-dp score rounding can
    // wiggle the measured mean by strictly less than this tolerance
    objs.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-3, s"objective regressed: $objs")
      case _ =>
    }
    assert(objs.last > objs.head, s"no improvement over init: $objs")
  }

  test("fit is deterministic under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      KMeans.fit(df, "vec_id", "embedding")
        .as[(Long, Long, Double)].collect().toSet
    assert(run(emb) === run(emb.repartition(7)))
  }

  test("kmeans-seeded semDedup: every dropped vector has a same-cell lower-id witness") {
    val asg = KMeans.assign(emb, "vec_id", "embedding",
        KMeans.centroids(emb, "vec_id", "embedding", KMeans.Config(k = 8, iterations = 2)))
      .select(col("vec_id"), col("cid").as("cell_id"), col("embedding"))
    val verdicts = SemDedup.semDedupOnAssignment(asg, "vec_id", "embedding", threshold = 0.4)
    assert(verdicts.count() === emb.count())
    val dropped = verdicts.filter(col("keep") === 0)
      .select(col("vec_id"), col("cell_id"))
    val witnesses = dropped.as("d")
      .join(asg.as("a"), col("d.cell_id") === col("a.cell_id") &&
        col("a.vec_id") < col("d.vec_id"))
      .join(emb.select(col("vec_id").as("dvid"), col("embedding").as("dvec")),
        col("d.vec_id") === col("dvid"))
      .filter(graft.operators.RelationalOps.round6(
        SimilaritySearch.cosine(col("a.embedding"), col("dvec"))) >= 0.4)
      .select(col("d.vec_id")).distinct().count()
    assert(witnesses === dropped.count(), "a dropped vector lacks a near-dup witness")
  }

  test("k=1 assigns every vector to the single seed's cluster") {
    val one = KMeans.fit(emb, "vec_id", "embedding", KMeans.Config(k = 1, iterations = 2))
    assert(one.select(countDistinct(col("cluster_id"))).as[Long].first() === 1L)
    assert(one.count() === emb.count())
  }
}
