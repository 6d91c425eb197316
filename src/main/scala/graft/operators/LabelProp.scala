package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label propagation (clamped-seed synchronous majority LPA — Zhu &
  * Ghahramani 2002 / Raghavan et al. 2007) over an undirected edge list:
  * spread a SPARSE set of trusted labels (human quality judgments, known
  * domains, licensed-source flags) to the whole corpus through the near-dup
  * graph — the semi-supervised classifier between "label 0.1% by hand" and
  * "label everything". Completes the graph family: ConnectedComponents
  * answers membership, PageRank answers centrality, this answers CLASS.
  *
  * Semantics, engine-exact (the registry entry `t_label_prop` unrolls every
  * round in DuckDB):
  *   - seeds are CLAMPED: a seed keeps its label whatever its neighbors say;
  *   - one synchronous round: every node takes the majority label among its
  *     labeled neighbors' CURRENT labels — ties by count fall to the
  *     lexicographically smallest label (integer counts, total order: no
  *     engine can disagree);
  *   - nodes with no labeled neighbor stay unlabeled this round; nodes
  *     outside the graph stay unlabeled forever (the caller left-joins or
  *     reads the `label IS NULL` rows as "needs human review").
  *
  * Scale shape, per round: ONE vote shuffle keyed by (dst, label) — a
  * partial-aggregable count over the symmetrized edge join — and one
  * argmax window over the per-node vote lists (votes are
  * O(edges·labels-per-neighborhood), never corpus×labels). Labels are
  * id-sized rows; the edge frame is MATERIALIZED before the symmetrizing
  * union (eager localCheckpoint — the ConnectedComponents discipline),
  * then pre-partitioned on the probe key and materialized again: the
  * caller's edge pipeline is often expensive (a shingle-join near-dup
  * computation), the union has two branches, and a lazy input would
  * execute that pipeline once per branch per round — measured at sf1
  * over the jaccard edges: 51 s lazy → the cost of ONE edge-pipeline
  * pass + ~3 s for the 3 label rounds (recorded as `label_prop_sec` in
  * the bench). Edge blocks are two longs per edge,
  * ContextCleaner-collected; the eager build cost is the trade the
  * CC/KMeans iterative family already documents. Lineage stays LINEAR in
  * rounds (each round reads the previous labels exactly once), so labels
  * themselves need no per-round checkpoint at these round counts; for
  * rounds ≫ 10 checkpoint labels too.
  */
object LabelProp {

  /** `rounds` synchronous clamped-seed majority rounds.
    *
    * @param edges undirected pairs (aCol, bCol) — one row per edge, either
    *              orientation; symmetrized internally
    * @param seeds (idCol, labelCol) trusted labels, clamped
    * @return (idCol, labelCol) for every node that ACQUIRED a label —
    *         seeds included; join back to the node table for the rest */
  def propagate(edges: DataFrame, seeds: DataFrame, rounds: Int,
      aCol: String = "a_id", bCol: String = "b_id",
      idCol: String = "doc_id", labelCol: String = "label"): DataFrame = {
    require(rounds >= 0, "rounds must be >= 0")
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    // materialize the one-sided edges FIRST: the symmetrizing union has two
    // branches, and unioning the raw input would execute the caller's edge
    // pipeline once per branch (see class doc); then pre-partition the
    // symmetrized frame on the probe key and materialize that, so every
    // round's vote join reads shuffled blocks
    val oneSided = edges.select(a.as("src"), b.as("dst")).localCheckpoint(true)
    val sym = oneSided
      .union(oneSided.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    // seeds are referenced ~2x per round (vote lineage + the clamp
    // anti-join) plus the final union — materialize them too, for the
    // same per-branch re-execution reason as the edges (the frame is
    // judgment-sized: id + label)
    val seed = seeds.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("string").as("label"))
      .localCheckpoint(true)
    var labels = seed
    for (_ <- 1 to rounds) {
      val votes = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dst"))
        .orderBy(col("cnt").desc, col("label"))
      val winners = votes
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst").as("id"), col("label"))
      labels = seed.union(
        winners.join(seed.select(col("id")), Seq("id"), "left_anti"))
    }
    labels.select(col("id").as(idCol), col("label").as(labelCol))
  }
}
