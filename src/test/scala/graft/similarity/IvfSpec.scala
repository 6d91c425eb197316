package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

class IvfSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, GraftTestSpark.sfDir, "embeddings").cache()

  test("training is deterministic and produces normalized centroids") {
    val c1 = IvfIndex.trainCentroids(emb, "embedding", IvfIndex.Config())
    val c2 = IvfIndex.trainCentroids(emb, "embedding", IvfIndex.Config())
    assert(c1 === c2)
    c1.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("IVF knn join finds the exact duplicate and beats random recall") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = SimilaritySearch.knnJoinBrute(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.knnJoinIVF(queries, emb, "vec_id", "embedding", 5,
      IvfIndex.Config(nCentroids = 16, nProbe = 8))
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // random embeddings are a worst case for a coarse quantizer; require a
    // clear margin over the ~nProbe/nCentroids=0.5 cell-coverage floor
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("persisted index: build/searchIndex equals the transient path exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    val cfg = IvfIndex.Config(nCentroids = 16, nProbe = 8)
    IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
    val queries = emb.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    val persisted = rows(
      IvfIndex.searchIndex(queries, dir, "vec_id", "embedding", 5, cfg.nProbe))
    val transient = rows(
      IvfIndex.knnJoinIVF(queries, emb, "vec_id", "embedding", 5, cfg))
    assert(persisted.nonEmpty)
    assert(persisted === transient,
      "the stored quantizer + inverted file must reproduce the transient search")
  }

  test("appendVectors assigns with stored centroids — no retrain, no loss") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-append").toString
    val cfg = IvfIndex.Config(nCentroids = 16, nProbe = 8)
    IvfIndex.build(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", dir, cfg)
    val before = IvfIndex.readCentroids(spark, dir)
    IvfIndex.appendVectors(
      emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding", dir)
    assert(IvfIndex.readCentroids(spark, dir) === before, "append must not retrain")
    // the inverted file now holds every vector exactly once
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() === emb.count())
    assert(cells.select("cand_id").distinct().count() === emb.count())
    // an appended (odd-id) vector is findable: its exact duplicate scores 1
    val dup = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 50000).as("vec_id"), col("embedding"), col("label"))
    IvfIndex.appendVectors(dup, "vec_id", "embedding", dir)
    val hits = IvfIndex.searchIndex(dup, dir, "vec_id", "embedding", 3, cfg.nProbe)
      .as[(Long, Long, Double, Long)].collect()
    assert(hits.exists(r => r._2 == 7L && r._3 >= 0.999999))
  }

  test("self-similar vectors land in the same cell (dup search works)") {
    val dup = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 50000).as("vec_id"), col("embedding"), col("label"))
    val withDup = emb.unionByName(dup)
    val res = IvfIndex.knnJoinIVF(
      withDup.filter(col("vec_id") === 7), withDup, "vec_id", "embedding", 3,
      IvfIndex.Config(nCentroids = 16, nProbe = 2))
      .as[(Long, Long, Double, Long)].collect()
    assert(res.exists(r => r._2 == 50007L && r._3 >= 0.999999))
  }
}
