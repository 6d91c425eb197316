package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.MmrSelect

/** Maximal-marginal-relevance diversified retrieval — the rerank between a
  * relevance stage and a RAG prompt (or a labeling batch): pick k results
  * that are relevant AND non-redundant instead of k near-copies of the best
  * hit. λ trades the two (λ=1 is plain top-k; λ=0 is pure diversity).
  *
  * Two-stage by construction, like every ANN family here:
  *   1. a RELEVANCE stage produces a per-query shortlist — exact cosine
  *      ([[diversifiedTopK]]'s built-in), or any ANN path
  *      ([[SimilaritySearch.knnJoinLSH]], [[IvfIndex.knnJoinIVF]]) whose
  *      output feeds [[rerank]];
  *   2. the greedy MMR selection runs INSIDE one aggregate evaluation per
  *      query ([[graft.expressions.MmrSelect]]) — the sequential-in-k loop
  *      sits where the per-query state already is, so the whole rerank is
  *      one groupBy whose exchange carries O(queries·shortlist) rows once
  *      (an unrolled round formulation would shuffle the shortlist k times).
  *
  * Arithmetic is the engine-portable fixed-point discipline: relevance and
  * pairwise sims on the 1e6 integer grid, λ rational out of 1000 — the
  * registry entry `e_mmr_topk` replays the full greedy in DuckDB.
  *
  * Reference scope: the reference engine has no retrieval reranking — this
  * extends it for RAG/training-batch assembly over the embeddings table.
  */
object Mmr {

  /** 1e6-grid fixed-point of a [0-ish] score — `floor(x·1e6 + 0.5)` as
    * BIGINT, the exact image of the oracle's CAST(floor(...) AS BIGINT). */
  def grid6(c: Column): Column = floor(c.cast("double") * 1e6 + 0.5).cast("long")

  /** MMR-rerank a per-query shortlist that carries candidate vectors.
    *
    * @param shortlist columns (queryCol, candCol: bigint, relCol: bigint on
    *                  the 1e6 grid, vecCol: array<float>) — at most
    *                  `maxCandidates` rows per query (loud error past it)
    * @return (queryCol, cand_id, rel double 6dp, rnk bigint 1..k) in
    *         selection order */
  def rerank(shortlist: DataFrame, k: Int, lambdaNum: Int,
      queryCol: String = "query_id", candCol: String = "cand_id",
      relCol: String = "rel", vecCol: String = "cv",
      maxCandidates: Int = MmrSelect.DefaultMaxCandidates): DataFrame =
    shortlist
      .groupBy(col(queryCol))
      .agg(MmrSelect(col(candCol).cast("long"), col(relCol), col(vecCol),
        k, lambdaNum, maxCandidates).as("__mmr"))
      .select(col(queryCol), explode(col("__mmr")).as("__e"))
      .select(col(queryCol), col("__e.cand_id").as("cand_id"),
        (col("__e.rel").cast("double") / 1000000.0).as("rel"),
        col("__e.rnk").cast("long").as("rnk"))

  /** Exact-relevance MMR: brute-force cosine shortlist (top `shortlist` per
    * query via the bounded-heap aggregate — the exchange carries the
    * shortlist, not the candidate set), then [[rerank]].
    *
    * The query frame BROADCASTS — brute force is O(queries·corpus) by
    * definition, so "queries are few" is this operator's contract, checked
    * by a bounded probe (the contaminationCounts guard discipline): past
    * `maxQueries` the right tool is an ANN shortlist into [[rerank]], and
    * this throws saying so rather than launching a quadratic join it can't
    * broadcast. The probe runs at CONSTRUCTION time (one scan job bounded
    * at maxQueries+1 rows — the TextSearch.knn guard's documented trade):
    * plan inspection of this operator is not free, but the probe never
    * re-executes an aggregate, only a bounded slice of the query scan. */
  def diversifiedTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      shortlist: Int, k: Int, lambdaNum: Int,
      excludeSelf: Boolean = false,
      maxQueries: Int = 100000): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("qv"))
    if (q.limit(maxQueries + 1).count() > maxQueries)
      throw new IllegalArgumentException(
        s"diversifiedTopK saw more than $maxQueries queries: brute-force " +
          "relevance is quadratic — shortlist via an ANN path " +
          "(knnJoinLSH/knnJoinIVF) and feed Mmr.rerank instead")
    // A corpus with duplicate ids would fan out both the scored cross join
    // (burning shortlist slots on copies) and the vector re-attach join
    // below (feeding duplicate candidates into MmrSelect, where they burn
    // k slots and can trip maxCandidates with a misleading message) —
    // collapse to one row per id up front.
    val c = corpus.select(col(idCol).cast("long").as("cand_id"),
      col(vecCol).as("cv")).dropDuplicates("cand_id")
    val self =
      if (excludeSelf) col("query_id") =!= col("cand_id") else lit(true)
    val scored = c.crossJoin(broadcast(q)).filter(self)
      .select(col("query_id"), col("cand_id"),
        grid6(SimilaritySearch.cosine(col("cv"), col("qv"))).as("rel"))
    val sl = SimilaritySearch
      .topKPerKey(scored.withColumn("rel_d", col("rel").cast("double")),
        "query_id", "rel_d", "cand_id", shortlist)
      .select(col("query_id"), col("cand_id"),
        col("rel_d").cast("long").as("rel"))
      .join(c, Seq("cand_id"))
    rerank(sl, k, lambdaNum)
  }
}
