package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The matryoshka two-stage search must return EXACT cosines (the rerank is
  * not approximate — only the shortlist is), reduce to brute force when the
  * prefix is the whole vector, and have recall that is measured and
  * monotone in the shortlist size. */
class MatryoshkaSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private lazy val emb =
    graft.Tables.load(spark, GraftTestSpark.sfDir, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 4)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("cand_id"), col("score"), col("rnk"))
      .as[(Long, Long, Double, Long)].collect().toSet

  test("prefixDim = full dim reduces to exact brute force") {
    val got = asSet(SimilaritySearch.knnPrefixRerank(
      queries, emb, "vec_id", "embedding",
      prefixDim = 64, shortlist = 16, k = 5))
    val exact = asSet(SimilaritySearch.knnJoinBrute(
      queries, emb, "vec_id", "embedding", k = 5))
    assert(got === exact)
  }

  test("returned scores ARE the exact full-dimension cosines") {
    val got = SimilaritySearch.knnPrefixRerank(
      queries, emb, "vec_id", "embedding",
      prefixDim = 16, shortlist = 24, k = 5)
    val exactScores = SimilaritySearch.knnJoinBrute(
      queries, emb, "vec_id", "embedding", k = Int.MaxValue - 1)
      .select(col("query_id"), col("cand_id"), col("score"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, c, s) => (q, c) -> s }.toMap
    got.select(col("query_id"), col("cand_id"), col("score"))
      .as[(Long, Long, Double)].collect()
      .foreach { case (q, c, s) => assert(s === exactScores((q, c))) }
  }

  private def recallAt(shortlist: Int, k: Int): Double = {
    val exact = asSet(SimilaritySearch.knnJoinBrute(
      queries, emb, "vec_id", "embedding", k))
      .map(r => (r._1, r._2))
    val got = asSet(SimilaritySearch.knnPrefixRerank(
      queries, emb, "vec_id", "embedding",
      prefixDim = 16, shortlist = shortlist, k = k))
      .map(r => (r._1, r._2))
    got.intersect(exact).size.toDouble / exact.size
  }

  test("recall is measured, floored, and monotone in shortlist size") {
    val r8 = recallAt(8, 5)
    val r32 = recallAt(32, 5)
    // synthetic (non-MRL) embeddings: the 16-of-64 prefix is a weak but
    // real signal — a genuine MRL model concentrates mass in the prefix
    // and pushes this toward 1.0
    assert(r32 >= 0.2, s"recall@5 with shortlist 32 collapsed: $r32")
    assert(r32 >= r8, s"recall must be monotone in shortlist: $r8 -> $r32")
    info(f"prefix-16/64 recall@5: shortlist 8 -> $r8%.2f, 32 -> $r32%.2f")
  }
}
