package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH dedup index — the operator LIFECYCLE for
  * incremental corpus curation, mirroring [[graft.similarity.IvfIndex]]'s
  * build/search/append shape. A standing 100 TB corpus does not re-shingle
  * itself for every new crawl; it keeps the banded signature table on disk
  * and dedupes ARRIVING documents against it:
  *
  *   - [[build]]: shingle + sign the corpus once; persist three tables under
  *     `dir` —
  *       `bands/` (band_key, doc_id) — the LSH bucket table, repartitioned
  *         and sorted by band_key so parquet row-group min/max stats skip
  *         non-probed buckets;
  *       `sets/`  (doc_id, sh)       — shingle-hash sets for exact-jaccard
  *         verification (id-keyed, only joined rows are read);
  *       `hot/`   (band_key)         — buckets over `maxBucket`, the
  *         precomputed skew guard (tiny; broadcast at search time).
  *   - [[searchNew]]: candidate-join NEW docs' bands against the stored
  *     bucket table (id-only shuffle), verify with exact jaccard over the
  *     stored sets — emits (new_id, corpus_id, inter, jaccard) pairs. The
  *     standing corpus is touched only through the index tables; nothing is
  *     re-shingled.
  *   - [[appendDocs]]: after the keep/drop decision, append the survivors'
  *     bands + sets and refresh `hot/` with one aggregation over the
  *     id-only bucket table — the incremental maintenance step (no global
  *     rebuild; same model as IVF's assign-with-stored-centroids).
  *
  * Family-agnostic: `cfg.portable` selects the same hash family on both the
  * indexed corpus and the probes, so the index works for the production
  * xxhash64 family and the oracle-portable family alike (the two must never
  * be mixed within one index — `build` stamps the family and `searchNew` /
  * `appendDocs` require a matching config).
  */
object TextDedupIndex {

  import TextDedup.MinHashConfig

  /** Shingle + sign + band `docs` under `cfg` — the shared derivation for
    * build, search, and append (they must agree byte-for-byte for bucket
    * keys to match). */
  private def derive(docs: DataFrame, idCol: String, textCol: String,
      cfg: MinHashConfig): (DataFrame, DataFrame) = {
    val sigs = TextDedup.signatures(docs, idCol, textCol, cfg)
      .filter(size(col("sh")) > 0)
    (TextDedup.bandRows(sigs, cfg), sigs.select(col("doc_id"), col("sh")))
  }

  /** Index `corpus` under `dir` (overwrites any previous index). */
  def build(corpus: DataFrame, idCol: String, textCol: String, dir: String,
      cfg: MinHashConfig = MinHashConfig()): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (bands, sets) = derive(corpus, idCol, textCol, cfg)
    bands
      .repartition(spark.sparkContext.defaultParallelism, col("band_key"))
      .sortWithinPartitions(col("band_key"))
      .write.mode("overwrite").parquet(s"$dir/bands")
    sets.write.mode("overwrite").parquet(s"$dir/sets")
    refreshHot(spark, dir, cfg)
    // stamp the hash family so a mismatched search fails loudly instead of
    // silently joining foreign bucket keys
    Seq((cfg.shingleK, cfg.numPerm, cfg.bands, cfg.seed, cfg.maxBucket, cfg.portable))
      .toDF("shingle_k", "num_perm", "bands", "seed", "max_bucket", "portable")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Recompute the over-cap bucket census from the id-only bands table.
    * Tiny by construction (only boilerplate buckets exceed the cap) and
    * type-preserving (band keys are long for the xxhash64 family, string
    * for the portable one). */
  private def refreshHot(spark: SparkSession, dir: String, cfg: MinHashConfig): Unit =
    spark.read.parquet(s"$dir/bands")
      .groupBy(col("band_key")).agg(count(lit(1)).as("n"))
      .filter(col("n") > cfg.maxBucket).select(col("band_key"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/hot")

  private def requireMatching(spark: SparkSession, dir: String,
      cfg: MinHashConfig): Unit = {
    val m = spark.read.parquet(s"$dir/meta").head()
    require(m.getAs[Int]("shingle_k") == cfg.shingleK
        && m.getAs[Int]("num_perm") == cfg.numPerm
        && m.getAs[Int]("bands") == cfg.bands
        && m.getAs[Long]("seed") == cfg.seed
        && m.getAs[Int]("max_bucket") == cfg.maxBucket
        && m.getAs[Boolean]("portable") == cfg.portable,
      s"index at $dir was built with a different MinHash family than $cfg")
  }

  /** Near-duplicate pairs of NEW docs against the INDEXED corpus:
    * (new_id, corpus_id, inter, jaccard), jaccard ≥ cfg.jaccardThreshold.
    * A new doc may also pair with an id present in both frames — callers
    * dedupe on id space. Hot (over-cap) buckets are excluded on BOTH sides,
    * exactly like [[TextDedup.candidatePairs]]'s census cap. */
  def searchNew(newDocs: DataFrame, dir: String, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val spark = newDocs.sparkSession
    requireMatching(spark, dir, cfg)
    val (newBands, newSets) = derive(newDocs, idCol, textCol, cfg)
    val hot = spark.read.parquet(s"$dir/hot")
    val corpusBands = spark.read.parquet(s"$dir/bands")
      .join(broadcast(hot), Seq("band_key"), "left_anti")
    val cand = newBands.join(broadcast(hot), Seq("band_key"), "left_anti")
      .withColumnRenamed("doc_id", "new_id")
      .join(corpusBands.withColumnRenamed("doc_id", "corpus_id"), Seq("band_key"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()
    val corpusSets = spark.read.parquet(s"$dir/sets")
    cand
      .join(newSets.withColumnRenamed("doc_id", "new_id")
        .withColumnRenamed("sh", "sh_new"), "new_id")
      .join(corpusSets.withColumnRenamed("doc_id", "corpus_id")
        .withColumnRenamed("sh", "sh_corpus"), "corpus_id")
      .withColumn("inter",
        size(array_intersect(col("sh_new"), col("sh_corpus"))).cast("long"))
      .withColumn("jaccard", graft.operators.RelationalOps.round6(
        col("inter").cast("double") /
          (size(col("sh_new")) + size(col("sh_corpus")) - col("inter")).cast("double")))
      .filter(!isnan(col("jaccard")) && col("jaccard") >= cfg.jaccardThreshold)
      .select(col("new_id"), col("corpus_id"), col("inter"), col("jaccard"))
  }

  /** Append (already-deduped) docs to the index and refresh the hot-bucket
    * census. */
  def appendDocs(newDocs: DataFrame, dir: String, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): Unit = {
    val spark = newDocs.sparkSession
    requireMatching(spark, dir, cfg)
    val (bands, sets) = derive(newDocs, idCol, textCol, cfg)
    bands
      .repartition(spark.sparkContext.defaultParallelism, col("band_key"))
      .sortWithinPartitions(col("band_key"))
      .write.mode("append").parquet(s"$dir/bands")
    sets.write.mode("append").parquet(s"$dir/sets")
    refreshHot(spark, dir, cfg)
  }
}
