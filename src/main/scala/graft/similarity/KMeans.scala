package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.RelationalOps.round6
import graft.similarity.SimilaritySearch.cosine

/** Spherical k-means (Lloyd's iterations, cosine objective) over an
  * embedding column — the trainable upgrade of [[SemDedup]]'s single-pass
  * hash-seed quantizer, and the producer of the "seeds from a k-means
  * pass" its production sizing calls for.
  *
  * Deterministic and engine-portable end to end, so the registry entry
  * carries a full DuckDB oracle (rare for an iterative clusterer):
  *   - init: the k vectors with the smallest portable hash of their id
  *     ([[SemDedup.seeds]] — no RNG), centroid id = seed's vec id;
  *   - assignment: argmax of the 6-dp-ROUNDED cosine with the smaller
  *     centroid id breaking ties — no last-bit float divergence can flip
  *     a cell (the fused kernel and the oracle's in-order fold are
  *     bit-identical on the raw score already; the rounding removes the
  *     only residual risk, cross-engine tie ORDER);
  *   - update: cosine is scale-invariant, so the mean's DIRECTION equals
  *     the sum's — the new centroid is the elementwise SUM of members'
  *     1e-9-grid quantized components (e_centroids' fixed-point recipe):
  *     exact BIGINTs in any engine, any merge order, and the division
  *     (with its truncation-portability hazard) never happens at all.
  *     Components stay under 2·10⁹·n ≪ 2⁶³ and convert to doubles
  *     exactly below 2⁵³ — at ~10⁹-row cells, rescale the grid (the
  *     overflow headroom note on [[PrincipalComponent]]).
  *   - empty cells are DROPPED (the standard Lloyd's variant): a cell
  *     nobody argmax-assigns to simply stops existing — both engines
  *     derive the survivor set from the same group-by, and the lazy plan
  *     stays linear (a carry-forward would reference each round twice,
  *     doubling lineage per iteration).
  *
  * Scale shape: per iteration, ONE pass over the corpus — the k×dim
  * centroid frame rides a 1-row broadcast array, assignment is a pure
  * per-row map (array_max over k fused cosines; no explode, no window),
  * and the update is a posexplode + partial-aggregated group-by whose
  * shuffle carries O(k·dim) rows. Like [[PrincipalComponent]], each
  * round's tiny centroid frame is eagerly localCheckpoint'ed (k rows) so
  * lineage stays flat across iterations; the corpus itself is never
  * cached — at 100 TB each Lloyd's round is one scan, and the standard
  * move is to train on a deterministic sample (the IVF trainer's
  * discipline) and run only the final assignment over the full corpus.
  *
  * Reference scope: the reference engine has no clustering operators —
  * this extends it for curation (SemDeDup cell training, mixture
  * balancing, hard-negative cells).
  */
object KMeans {

  final case class Config(k: Int = 8, iterations: Int = 4)

  /** 1e-9-grid quantization of a float/double component — exact longs,
    * order-independent sums (the e_centroids recipe). */
  private def grid(x: Column): Column = floor(x.cast("double") * 1e9).cast("long")

  /** Initial centroids: the k hash-smallest vectors, components on the
    * 1e-9 grid (uniform with every later round's sum-typed centroids).
    * (cid, cv: array<double>). */
  def init(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    SemDedup.seeds(emb, idCol, vecCol, k)
      .select(col("seed_id").as("cid"),
        transform(col("sv"), x => grid(x).cast("double")).as("cv"))

  /** One Lloyd's round: assign to the argmax-cosine centroid, then sum
    * members' grid components per (cid, pos). Input/output centroid
    * frames are (cid, cv: array<double>). */
  private def step(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    assign(emb, idCol, vecCol, centroids)
      .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(grid(col("v"))).as("s"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s").cast("double")).as("cv"))

  /** Nearest-centroid assignment: (idCol, vecCol, cid, score). The
    * centroid set rides a 1-row broadcast array; argmax is array_max over
    * a (rounded score, -cid) struct — max score wins, ties fall to the
    * smaller centroid id (the [[SemDedup.assignCells]] shape). */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val centArr = centroids
      .agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cent_arr"))
    val best = array_max(transform(col("cent_arr"), c =>
      struct(round6(cosine(col(vecCol), c.getField("cv"))).as("score"),
        (-c.getField("cid")).as("negcid"))))
    emb.crossJoin(broadcast(centArr))
      .withColumn("best", best)
      .select(col(idCol).cast("long").as(idCol), col(vecCol),
        (-col("best.negcid")).as("cid"), col("best.score").as("score"))
  }

  /** Final centroids after `cfg.iterations` Lloyd's rounds:
    * (cid, cv: array<double> — 1e-9-grid integer sums, exact). */
  def centroids(emb: DataFrame, idCol: String, vecCol: String,
      cfg: Config = Config()): DataFrame = {
    require(cfg.k >= 1 && cfg.iterations >= 0)
    var cent = init(emb, idCol, vecCol, cfg.k).localCheckpoint(true)
    for (_ <- 1 to cfg.iterations)
      cent = step(emb, idCol, vecCol, cent).localCheckpoint(true)
    cent
  }

  /** Fit + final assignment: (idCol, cluster_id, score). */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
      cfg: Config = Config()): DataFrame =
    assign(emb, idCol, vecCol, centroids(emb, idCol, vecCol, cfg))
      .select(col(idCol), col("cid").as("cluster_id"), col("score"))
}
