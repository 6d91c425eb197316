package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.portableHash60
import graft.functions.VectorFunctions.cosine
import graft.operators.RelationalOps.round6

/** SemDeDup-style semantic deduplication over an embedding column: partition
  * the corpus into cells around a handful of seed vectors, then mark as
  * duplicates the vectors whose within-cell cosine to a LOWER-id neighbor
  * clears a threshold (keep-the-first semantics). The whole point of the
  * cell stage is to bound the quadratic pair scan to cell-sized blocks —
  * at corpus scale the all-pairs cosine is unrunnable, while per-cell pairs
  * are (cells shrink as nCells grows; production sizing is
  * nCells ≈ corpus / targetCellSize, seeds from a k-means pass).
  *
  * Everything here is DETERMINISTIC and engine-portable, which is what lets
  * the registry entry carry a full DuckDB oracle (rare for a clustering
  * operator):
  *  - seeds are not random and not iterative: the nCells vectors with the
  *    smallest portable 60-bit hash of their id — any engine recomputes the
  *    same seed set with one ORDER BY/LIMIT;
  *  - assignment is argmax cosine over the seed set, on the 6-dp-ROUNDED
  *    score with the smaller seed id breaking ties — no last-bit float
  *    divergence can flip a cell;
  *  - the duplicate rule compares 6-dp-rounded pair cosines, ties broken by
  *    the id order built into `a_id < b_id`.
  *
  * Scale shape: the seed set is O(nCells·dim) and broadcast once; assignment
  * is a pure per-row map (one array_max over nCells fused cosines — no
  * explode, no shuffle, no window); the only shuffle is the per-cell
  * self-join, which carries each embedding once per side. A pathologically
  * hot cell re-creates the quadratic blowup — the guard at scale is the same
  * census-and-cap discipline as the LSH bucket path
  * (`TextDedup.lshBucketStats`): count cell sizes, raise nCells (or split the
  * hot cell on a second seed round) before running the pair stage.
  *
  * Reference scope: the reference engine has no embedding operators at all —
  * this family extends it for training-data curation (SemDeDup: Abbas et al.
  * 2023, arXiv:2303.09540).
  */
object SemDedup {

  final case class Config(nCells: Int = 16, threshold: Double = 0.4)

  /** Deterministic seed vectors: the `nCells` rows with the smallest
    * portable hash of their id (tiebreak id). One TakeOrdered, O(nCells)
    * result — never a full sort at scale. */
  def seeds(emb: DataFrame, idCol: String, vecCol: String, nCells: Int): DataFrame =
    emb.select(col(idCol).cast("long").as("seed_id"), col(vecCol).as("sv"),
        portableHash60(concat(lit("seed:"), col(idCol).cast("string"))).as("h"))
      .orderBy(col("h"), col("seed_id"))
      .limit(nCells)
      .drop("h")

  /** Nearest-seed cell assignment: (id, cell_id, vec). The seed set rides a
    * 1-row broadcast array; the argmax is a per-row `array_max` over a
    * struct of (rounded score, -seed_id) — max score wins, ties fall to the
    * smaller seed id. Zero shuffles, zero windows. */
  def assignCells(emb: DataFrame, idCol: String, vecCol: String, nCells: Int): DataFrame = {
    val seedArr = seeds(emb, idCol, vecCol, nCells)
      .agg(sort_array(collect_list(struct(col("seed_id"), col("sv")))).as("seed_arr"))
    val best: Column = array_max(transform(col("seed_arr"), s =>
      struct(round6(cosine(col(vecCol), s.getField("sv"))).as("score"),
        (-s.getField("seed_id")).as("negid"))))
    emb.crossJoin(broadcast(seedArr))
      .withColumn("best", best)
      .select(col(idCol).cast("long").as(idCol), (-col("best.negid")).as("cell_id"),
        col(vecCol))
  }

  /** Per-vector verdict: (id, cell_id, keep 1|0). keep = 0 iff some
    * same-cell vector with a smaller id is cosine-similar past the
    * threshold. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String, cfg: Config): DataFrame = {
    val asg = assignCells(emb, idCol, vecCol, cfg.nCells)
    val a = asg.select(col("cell_id"), col(idCol).as("a_id"), col(vecCol).as("va"))
    val b = asg.select(col("cell_id"), col(idCol).as("b_id"), col(vecCol).as("vb"))
    val dropped = a.join(b, Seq("cell_id"))
      .filter(col("a_id") < col("b_id"))
      .filter(round6(cosine(col("va"), col("vb"))) >= cfg.threshold)
      .select(col("b_id").as(idCol)).distinct()
    asg.select(col(idCol), col("cell_id"))
      .join(dropped.withColumn("is_dup", lit(1L)), Seq(idCol), "left")
      .select(col(idCol), col("cell_id"),
        when(col("is_dup").isNull, 1L).otherwise(0L).as("keep"))
  }
}
