package graft.retrieval

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** nDCG/MRR/precision/recall must match hand-computed values on a known
  * example, hit their boundary cases exactly (perfect ranking → 1.0, no
  * hits → 0.0), and be partitioning-invariant. The fixed-point discount
  * table is pinned by value — it is the cross-engine contract. */
class RetrievalMetricsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("discount table: exact 1e6-grid values at the anchor ranks") {
    val d = RetrievalMetrics.discounts6(4).toMap
    assert(d(1) === 1000000L) // 1/log2(2) = 1
    assert(d(2) === 630930L)  // 1/log2(3)
    assert(d(3) === 500000L)  // 1/log2(4) = 0.5 exactly
    assert(RetrievalMetrics.discountValuesSql(2) ===
      "(VALUES (1, 1000000), (2, 630930))")
  }

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("hand-computed example: graded qrels, partial hits") {
    // qrels: a=3, b=2, c=1; results@3: [b, x, a]
    val results = Seq((1L, 20L, 1L), (1L, 99L, 2L), (1L, 10L, 3L))
      .toDF("query_id", "cand_id", "rnk")
    val qrels = Seq((1L, 10L, 3L), (1L, 20L, 2L), (1L, 30L, 1L))
      .toDF("query_id", "cand_id", "rel")
    val d = RetrievalMetrics.discounts6(3).toMap
    val dcg6 = 2L * d(1) + 3L * d(3)
    val idcg6 = 3L * d(1) + 2L * d(2) + 1L * d(3)
    val got = RetrievalMetrics.evaluate(results, qrels, 3)
      .as[(Long, Double, Double, Double, Double, Long)].collect()
    assert(got.length === 1)
    val (q, ndcg, mrr, p, r, hits) = got.head
    assert(q === 1L)
    assert(ndcg === round6(dcg6.toDouble / idcg6.toDouble))
    assert(mrr === 1.0)                 // first hit at rank 1
    assert(p === round6(2.0 / 3.0))
    assert(r === round6(2.0 / 3.0))
    assert(hits === 2L)
  }

  test("duplicate (query_id, cand_id) rows do not fan out the metrics") {
    // duplicate qrels (same pair judged twice, once at a lower grade) and a
    // duplicate result row: metrics must equal the clean single-row input —
    // the old left join fanned out and inflated hits/DCG/recall
    val results = Seq((1L, 20L, 1L), (1L, 99L, 2L), (1L, 10L, 3L),
      (1L, 10L, 3L)) // dup result row
      .toDF("query_id", "cand_id", "rnk")
    val qrels = Seq((1L, 10L, 3L), (1L, 10L, 1L), // dup judgment, lower grade
      (1L, 20L, 2L), (1L, 30L, 1L))
      .toDF("query_id", "cand_id", "rel")
    val cleanR = Seq((1L, 20L, 1L), (1L, 99L, 2L), (1L, 10L, 3L))
      .toDF("query_id", "cand_id", "rnk")
    val cleanQ = Seq((1L, 10L, 3L), (1L, 20L, 2L), (1L, 30L, 1L))
      .toDF("query_id", "cand_id", "rel")
    val got = RetrievalMetrics.evaluate(results, qrels, 3).collect().toSeq
    val want = RetrievalMetrics.evaluate(cleanR, cleanQ, 3).collect().toSeq
    assert(got === want)
  }

  test("perfect ranking scores 1.0 across the board") {
    val qrels = Seq((1L, 10L, 3L), (1L, 20L, 2L), (1L, 30L, 1L))
      .toDF("query_id", "cand_id", "rel")
    val results = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "cand_id", "rnk")
    val got = RetrievalMetrics.evaluate(results, qrels, 3)
      .as[(Long, Double, Double, Double, Double, Long)].collect().head
    assert(got === ((1L, 1.0, 1.0, 1.0, 1.0, 3L)))
  }

  test("zero hits scores zero, and rel-0 judgments are ignored") {
    val qrels = Seq((1L, 10L, 2L), (1L, 99L, 0L))
      .toDF("query_id", "cand_id", "rel")
    val results = Seq((1L, 50L, 1L), (1L, 99L, 2L))
      .toDF("query_id", "cand_id", "rnk")
    val got = RetrievalMetrics.evaluate(results, qrels, 2)
      .as[(Long, Double, Double, Double, Double, Long)].collect().head
    // cand 99 is judged rel 0: retrieving it is NOT a hit
    assert(got === ((1L, 0.0, 0.0, 0.0, 0.0, 0L)))
  }

  test("ranks beyond k are ignored; queries without qrels are dropped") {
    val qrels = Seq((1L, 10L, 1L)).toDF("query_id", "cand_id", "rel")
    val results = Seq((1L, 10L, 5L), (2L, 77L, 1L))
      .toDF("query_id", "cand_id", "rnk")
    val got = RetrievalMetrics.evaluate(results, qrels, 3)
      .as[(Long, Double, Double, Double, Double, Long)].collect()
    assert(got.map(_._1).toSet === Set(1L)) // query 2 has no judgments
    assert(got.head._6 === 0L)              // the rank-5 hit is past k=3
  }

  test("a real engine ranking judged against itself scores 1.0 across the board") {
    // cross-family composition: the exact-cosine ranking from the
    // similarity family is both the results AND the graded qrels — every
    // metric must hit its ceiling on real engine outputs, not just
    // hand-built frames
    val emb = graft.Tables.load(spark, graft.GraftTestSpark.sfDir, "embeddings")
    val ranking = graft.similarity.SimilaritySearch.knnJoinBrute(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("cand_id"), col("rnk"))
    val qrels = ranking.select(col("query_id"), col("cand_id"),
      (lit(6L) - col("rnk")).as("rel"))
    val got = RetrievalMetrics.evaluate(ranking, qrels, 5)
      .as[(Long, Double, Double, Double, Double, Long)].collect()
    assert(got.length === 3)
    got.foreach { case (_, ndcg, mrr, p, r, hits) =>
      assert(ndcg === 1.0 && mrr === 1.0 && p === 1.0 && r === 1.0 && hits === 5L)
    }
  }

  test("partition-count invariant") {
    // deterministic key construction: cand ids are distinct per query on
    // both frames, so the inputs are identical across runs by value
    val results = (for (q <- 0 until 10; r <- 1 to 10)
      yield (q.toLong, ((q * 17 + r * 13) % 97).toLong, r.toLong))
      .toDF("query_id", "cand_id", "rnk")
    val qrels = (for (q <- 0 until 10; c <- 0 until 12)
      yield (q.toLong, ((q * 29 + c * 11) % 97).toLong, ((q + c) % 3 + 1).toLong))
      .toDF("query_id", "cand_id", "rel")
    def run(p: Int) = RetrievalMetrics
      .evaluate(results.repartition(p), qrels.repartition(p), 10)
      .as[(Long, Double, Double, Double, Double, Long)].collect().toSet
    assert(run(1) === run(17))
  }
}
