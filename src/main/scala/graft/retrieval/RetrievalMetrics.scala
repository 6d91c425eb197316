package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline retrieval evaluation — the metrics loop that closes every
  * retrieval/ANN family here (BM25, text knn, LSH/IVF/PQ/matryoshka
  * search): given a RESULTS ranking and a QRELS relevance set, per-query
  * nDCG@k, MRR, precision@k, recall@k. A retrieval stack without its
  * eval harness can't be tuned; this is the operator a user runs after
  * every index/recall change (Järvelin & Kekäläinen 2002 for nDCG).
  *
  * Engine-portable by construction — the one hazard in nDCG is
  * `1/log2(rank+1)`: libm and the JVM may disagree in the last ulp, so the
  * discount is NOT computed in SQL or in Spark at eval time. Instead
  * [[discounts6]] computes the k discounts ONCE in the JVM on the 1e6
  * fixed-point grid and both engines join the same literal table
  * ([[discountValuesSql]] renders it into the oracle) — DCG becomes an
  * exact BIGINT dot product `Σ rel·disc6`, order-independent under any
  * merge schedule, and nDCG one final double division of two exact longs.
  *
  * Scale shape: results pre-filter to rank ≤ k, so the qrels join and all
  * aggregates run on O(queries·k) rows; the discount table is k rows
  * broadcast; per-query state is a handful of sums — no windows over the
  * corpus, no candidate-set shuffle. Qrels-side ideal-DCG needs one
  * row_number over qrels partitioned by query (qrels are human/oracle
  * judgments — thousands per query at most, never corpus-sized).
  *
  * Reference scope: the reference engine has no evaluation operators; this
  * extends it alongside the retrieval family it measures.
  */
object RetrievalMetrics {

  /** rank → floor(1/log2(rank+1)·1e6 + 0.5), rank 1..k — the shared
    * fixed-point discount table (rank 1 → 1000000). */
  def discounts6(k: Int): Seq[(Int, Long)] =
    (1 to k).map { r =>
      r -> math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong
    }

  /** The same table as a SQL VALUES list: `(VALUES (1, 1000000), ...)`. */
  def discountValuesSql(k: Int): String =
    discounts6(k).map { case (r, d) => s"($r, $d)" }.mkString("(VALUES ", ", ", ")")

  /** Per-query metrics of `results` against `qrels`.
    *
    * @param results (query_id, cand_id, rnk) — rnk 1-based, ranks > k are
    *                ignored (metrics@k)
    * @param qrels   (query_id, cand_id, rel) — graded relevance, rel ≥ 1;
    *                absent pairs mean rel 0
    * @return (query_id, ndcg, mrr, precision_at_k, recall_at_k, hits) —
    *         one row per query that has at least one qrel (queries with no
    *         judgments are unmeasurable and dropped); doubles 6-dp rounded
    */
  def evaluate(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = results.sparkSession
    import spark.implicits._
    val disc = broadcast(discounts6(k).toDF("rnk", "disc6"))

    // Duplicate (query_id, cand_id) rows on either side would fan out the
    // rel join and silently inflate hits/DCG/recall — collapse them
    // deterministically (best rank on the result side, highest grade on
    // the qrels side) so malformed input degrades loudly-documented, not
    // silently-wrong.
    val res = results
      .select(col("query_id"), col("cand_id"), col("rnk").cast("long").as("rnk"))
      .filter(col("rnk") <= k)
      .groupBy(col("query_id"), col("cand_id"))
      .agg(min(col("rnk")).as("rnk"))
    // rel ≥ 1 is the qrels contract; a rel-0 judgment is "not relevant" and
    // must not inflate n_rel or zero the ideal DCG
    val qr = qrels.select(col("query_id"), col("cand_id"),
      col("rel").cast("long").as("rel"))
      .filter(col("rel") > 0)
      .groupBy(col("query_id"), col("cand_id"))
      .agg(max(col("rel")).as("rel"))

    // realized DCG + hit stats over the ranked list
    val scored = res
      .join(qr, Seq("query_id", "cand_id"), "left")
      .na.fill(0L, Seq("rel"))
      .join(disc, res("rnk") === disc("rnk"))
      .groupBy(col("query_id"))
      .agg(
        sum(col("rel") * col("disc6")).as("dcg6"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"),
        min(when(col("rel") > 0, res("rnk"))).as("first_hit"))

    // ideal DCG: qrels sorted by grade (cand tiebreak), discounted at 1..k
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cand_id"))
    val ideal = qr
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .join(disc, Seq("rnk"))
      .groupBy(col("query_id"))
      .agg(sum(col("rel") * col("disc6")).as("idcg6"))
    val totals = qr.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))

    import graft.operators.RelationalOps.round6
    ideal.join(totals, Seq("query_id"))
      .join(scored, Seq("query_id"), "left")
      .na.fill(0L, Seq("dcg6", "hits"))
      .select(
        col("query_id"),
        round6(col("dcg6").cast("double") / col("idcg6").cast("double"))
          .as("ndcg"),
        round6(when(col("first_hit").isNull, 0.0)
          .otherwise(lit(1.0) / col("first_hit").cast("double"))).as("mrr"),
        round6(col("hits").cast("double") / k.toDouble).as("precision_at_k"),
        round6(col("hits").cast("double") / col("n_rel").cast("double"))
          .as("recall_at_k"),
        col("hits"))
  }
}
