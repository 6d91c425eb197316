package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.portableHash60

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", PAMI 2011) — the memory path for ANN at the 768-dim
  * regime: the vector splits into `m` contiguous subvectors, each encoded
  * as the id of its nearest codebook entry, so a stored code is
  * m·log₂(nCodes) bits (8 subspaces × 16 codes = 4 BYTES against 256
  * bytes of float32 — a 64× compression the int8 path (e_quant_topk)
  * cannot reach), and query scoring is table lookups: per query, one
  * m×nCodes lookup table of subspace dot products, then score(q, x) =
  * Σⱼ LUT[j][codeⱼ(x)] — the asymmetric distance computation (ADC), no
  * per-candidate float folds at all.
  *
  * Codebooks follow the repo's deterministic hash-seed discipline (the
  * SemDedup/SemCell quantizer pattern): the nCodes vectors whose
  * md5-derived hash orders lowest are the seeds, and subspace j's
  * codebook is their j-th subvectors. Deterministic and engine-replayable
  * — which makes the ENTIRE pipeline (seed choice, nearest-code
  * assignment, LUT, fixed-point ADC sum, top-k) full-oracle-able in
  * DuckDB (the e_pq_topk registry entry) — where k-means-trained
  * codebooks would be rows-only. A production deployment swaps trained
  * codebooks in; every shape below (broadcast codebook, aggregate argmin,
  * O(m) LUT join) is unchanged by that swap.
  *
  * Scale shape: the codebook is m×nCodes rows — broadcast everywhere; the
  * encode pass is a per-row map against it (no shuffle; O(N·m·nCodes)
  * bounded-dim folds, the standard PQ encode cost paid once per corpus);
  * nearest-code selection is a partial-aggregable min-of-struct, never a
  * window; the ADC sum is a per-vector sum of m LONGS on the exact
  * 1e-9 grid (the e_centroids fixed-point discipline — order-independent
  * under any merge schedule); the top-k is TakeOrderedAndProject.
  */
object ProductQuantizer {

  /** `m` × `subDim` must equal the embedding dim (64 here). */
  final case class Config(m: Int = 8, subDim: Int = 8, nCodes: Int = 16)

  /** In-order double fold of `expr(i)` for i in [j·subDim+1, j·subDim+subDim]
    * — mirrors the DuckDB list_reduce image term for term. RETAINED as the
    * equivalence reference only (ProductQuantizerSpec asserts the native
    * kernel is bit-identical); the hot paths use [[SubspaceKernel]] —
    * this higher-order form runs interpreted per element, the known
    * O(rows·expansion) anti-pattern (cf. CosineSimilarity's scaladoc). */
  private def subFold(j: Column, subDim: Int)(term: Column => Column): Column =
    aggregate(sequence(j * subDim + 1, j * subDim + subDim),
      lit(0.0), (acc, i) => acc + term(i))

  private[similarity] def subL2Composed(a: Column, b: Column, j: Column, subDim: Int): Column =
    subFold(j, subDim) { i =>
      val d = element_at(a, i).cast("double") - element_at(b, i).cast("double")
      d * d
    }

  private[similarity] def subDotComposed(a: Column, b: Column, j: Column, subDim: Int): Column =
    subFold(j, subDim)(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))

  private def subL2(a: Column, b: Column, j: Column, subDim: Int): Column =
    graft.expressions.SubspaceKernel.l2(a, b, j, subDim)

  private def subDot(a: Column, b: Column, j: Column, subDim: Int): Column =
    graft.expressions.SubspaceKernel.dot(a, b, j, subDim)

  /** Hash-ordered seed frame: (code_id, sv) — nCodes rows, broadcast. */
  private def seeds(e: DataFrame, cfg: Config): DataFrame =
    e.withColumn("h",
        portableHash60(concat(lit("pqseed:"), col("vec_id").cast("string"))))
      .orderBy(col("h"), col("vec_id")).limit(cfg.nCodes)
      .select(col("vec_id").as("code_id"), col("v").as("sv"))

  private def subspaces(df: DataFrame, m: Int): DataFrame =
    df.sparkSession.range(m.toLong).select(col("id").cast("int").as("j"))

  private def normalized(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))

  /** PQ codes: one row per (vec_id, j) with the nearest codebook entry by
    * per-subspace L2 (6-dp rounded, code-id tiebreak — deterministic in
    * any engine). The argmin is a min-of-struct AGGREGATE: partial phases
    * shrink the m×nCodes expansion back to m rows per vector before any
    * exchange; a window form would sort the whole expansion. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
      cfg: Config = Config()): DataFrame =
    encodeDetailed(emb, idCol, vecCol, cfg)
      .select(col("vec_id"), col("j"), col("code_id"))

  /** [[encode]] keeping the winning per-subspace quantization error —
    * (vec_id, j, code_id, dist) with `dist` on the 6-dp grid. Feeds the
    * distortion diagnostics (e_pq_distortion) at zero extra compute: the
    * argmin aggregate already carries the distance it minimized. */
  def encodeDetailed(emb: DataFrame, idCol: String, vecCol: String,
      cfg: Config = Config()): DataFrame = {
    val e = normalized(emb, idCol, vecCol)
    val sd = seeds(e, cfg)
    e.crossJoin(broadcast(sd)).crossJoin(broadcast(subspaces(e, cfg.m)))
      .withColumn("dist", graft.operators.RelationalOps.round6(
        subL2(col("v"), col("sv"), col("j"), cfg.subDim)))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("dist"), col("code_id"))).as("mn"))
      .select(col("vec_id"), col("j"), col("mn.code_id").as("code_id"),
        col("mn.dist").as("dist"))
  }

  /** Top-`k` corpus vectors for the `queryId` vector by the ADC
    * approximate dot product (the PQ operating score; rerank via
    * [[pqTopKReranked]] when exact order matters). Output
    * (vec_id, pq_score), score = Σⱼ LUT on the 1e-9 fixed-point grid,
    * 6-dp rounded, id tiebreak. */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, cfg: Config = Config()): DataFrame =
    adcTopK(emb, idCol, vecCol, queryId, k, cfg, candidates = None)

  /** IVF-PQ (the IVFADC composition, Jégou et al. §IV): the SemCell coarse
    * quantizer restricts ADC scoring to the query's `nProbe` nearest
    * cells, so a search touches O(nProbe/nCells) of the code table instead
    * of all of it — the standard memory-AND-compute operating point for
    * billion-vector corpora (IVF prunes the candidates, PQ shrinks what
    * remains to bytes). Both stages are the repo's deterministic
    * hash-seed constructions, so the WHOLE composition is
    * full-oracle-able (e_ivfpq_topk): probe cells are the top-nProbe
    * 6-dp-rounded seed cosines (seed-id tiebreak — the assignCells
    * score), candidates are their members, scores are the fixed-point ADC
    * sums. Approximation is two-layer (cell pruning may drop true
    * neighbors; ADC scores are quantized) — ProductQuantizerSpec measures
    * recall against both the exact baseline and plain PQ. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, nProbe: Int = 4, nCells: Int = 16,
      cfg: Config = Config()): DataFrame = {
    val e = normalized(emb, idCol, vecCol)
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    // One seed derivation (a corpus TakeOrdered) feeds BOTH the probe
    // ranking and the cell assignment.
    val sd = SemDedup.seeds(emb, idCol, vecCol, nCells)
    // Top-nProbe cells by the same rounded score assignCells ranks with.
    val probe = sd
      .crossJoin(broadcast(q))
      .select(col("seed_id").as("cell_id"), graft.operators.RelationalOps.round6(
        SimilaritySearch.cosine(col("qv"), col("sv"))).as("s"))
      .orderBy(col("s").desc, col("cell_id"))
      .limit(nProbe)
      .select(col("cell_id"))
    val cand = SemDedup.assignCellsTo(emb, idCol, vecCol, sd)
      .select(col(idCol).as("vec_id"), col("cell_id"))
      .join(broadcast(probe), Seq("cell_id"))
      .select(col("vec_id"))
    adcTopK(emb, idCol, vecCol, queryId, k, cfg, candidates = Some(cand))
  }

  /** ADC top-k over the full corpus or a candidate id set. The candidate
    * join is a LEFT SEMI on ids — at production sizing the probed subset
    * is corpus/nCells·nProbe (not broadcastable); AQE picks the join. */
  private def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, cfg: Config,
      candidates: Option[DataFrame]): DataFrame = {
    val e = normalized(emb, idCol, vecCol)
    val sd = seeds(e, cfg)
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    val lut = q.crossJoin(broadcast(sd)).crossJoin(broadcast(subspaces(e, cfg.m)))
      .select(col("j"), col("code_id"),
        floor(subDot(col("qv"), col("sv"), col("j"), cfg.subDim) * 1e9)
          .cast("long").as("lf"))
    val codes = encode(emb, idCol, vecCol, cfg)
      .filter(col("vec_id") =!= queryId)
    val scoped = candidates.fold(codes)(c =>
      codes.join(c, Seq("vec_id"), "left_semi"))
    scoped
      .join(broadcast(lut), Seq("j", "code_id"))
      .groupBy(col("vec_id")).agg(sum(col("lf")).as("sfp"))
      .select(col("vec_id"), graft.operators.RelationalOps.round6(
        col("sfp").cast("double") / 1e9).as("pq_score"))
      .orderBy(col("pq_score").desc, col("vec_id"))
      .limit(k)
  }

  /** The production two-stage shape: PQ-ADC shortlist of `shortlist`
    * candidates (table lookups over codes — the cheap pass), exact cosine
    * rerank of only those (the expensive fold runs on `shortlist` rows,
    * not the corpus). Output (vec_id, score, rnk) by exact cosine. */
  def pqTopKReranked(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, shortlist: Int,
      cfg: Config = Config()): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val e = normalized(emb, idCol, vecCol)
    val cand = pqTopK(emb, idCol, vecCol, queryId, shortlist, cfg)
      .select(col("vec_id"))
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    e.join(broadcast(cand), Seq("vec_id")).crossJoin(broadcast(q))
      .select(col("vec_id"), graft.operators.RelationalOps.round6(
        graft.functions.VectorFunctions.cosine(col("v"), col("qv"))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("vec_id")))
        .cast("long"))
  }
}
