package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}
import graft.functions.VectorFunctions

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, GraftTestSpark.sfDir, "embeddings").cache()

  test("fused CosineSimilarity expression == composed functions cosine, bit-for-bit") {
    val both = emb.limit(100).crossJoin(
        broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
      .select(
        SimilaritySearch.cosine(col("embedding"), col("qv")).as("fused"),
        VectorFunctions.cosine(col("embedding"), col("qv")).as("composed"))
      .as[(Double, Double)].collect()
    both.foreach { case (f, c) => assert(f === c) }
  }

  test("fused cosine accepts array<double> per side; float widening is exact") {
    val both = emb.limit(50)
      .select(col("embedding"),
        transform(col("embedding"), _.cast("double")).as("emb_d"))
      .select(
        SimilaritySearch.cosine(col("embedding"), col("embedding")).as("ff"),
        SimilaritySearch.cosine(col("embedding"), col("emb_d")).as("fd"),
        SimilaritySearch.cosine(col("emb_d"), col("emb_d")).as("dd"))
      .as[(Double, Double, Double)].collect()
    both.foreach { case (ff, fd, dd) => assert(ff === fd); assert(fd === dd) }
  }

  test("cosine of a vector with itself is 1") {
    val got = emb.limit(20)
      .select(SimilaritySearch.cosine(col("embedding"), col("embedding")))
      .as[Double].collect()
    got.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("brute-force topK returns k rows ordered by score desc") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .as[Array[Float]].first()
    val top = SimilaritySearch.topK(emb.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", q, 10).as[(Long, Double)].collect()
    assert(top.length === 10)
    assert(top.map(_._2).toSeq === top.map(_._2).sortBy(-_).toSeq)
  }

  test("LSH knn join reaches >=50% recall@5 of brute force on sf0.001") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = SimilaritySearch.knnJoinBrute(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val lsh = SimilaritySearch.knnJoinLSH(queries, emb, "vec_id", "embedding", 5,
      SimilaritySearch.LshConfig(dim = 64))
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("embeddingDupPairs finds planted exact duplicate vectors") {
    val dup = emb.filter(col("vec_id") === 1)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val withDup = emb.unionByName(dup)
    val pairs = SimilaritySearch.embeddingDupPairs(withDup, "vec_id", "embedding",
      threshold = 0.999, SimilaritySearch.LshConfig(dim = 64, bands = 16, bitsPerBand = 8))
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 100001L && p._3 >= 0.999999))
  }
}
