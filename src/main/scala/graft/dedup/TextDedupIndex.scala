package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH dedup index — the operator LIFECYCLE for
  * incremental corpus curation, mirroring [[graft.similarity.IvfIndex]]'s
  * build/search/append shape. A standing 100 TB corpus does not re-shingle
  * itself for every new crawl; it keeps the banded signature table on disk
  * and dedupes ARRIVING documents against it:
  *
  *   - [[build]]: shingle + sign the corpus ONCE (one text scan: the
  *     signature frame is written first and the band table derives from the
  *     written columns, never from a second derivation of the text), then
  *     persist three tables under `dir` —
  *       `sets/`   (doc_id, sh, sig) — shingle-hash sets for exact-jaccard
  *         verification plus the signature (id-keyed; searches prune to
  *         doc_id+sh, so the sig column costs nothing at probe time);
  *       `bands/`  (band_key, doc_id) — the LSH bucket table, repartitioned
  *         and sorted by band_key so parquet row-group min/max stats skip
  *         non-probed buckets;
  *       `counts/` (band_key, n)      — the per-bucket census. Search joins
  *         it with the arriving batch's own band counts so the `maxBucket`
  *         skew cap applies to the COMBINED bucket size, exactly like the
  *         transient pipeline's census over the union corpus.
  *   - [[searchNew]]: candidate-join NEW docs' bands against the stored
  *     bucket table (id-only shuffle), verify with exact jaccard over the
  *     stored sets — emits (new_id, corpus_id, inter, jaccard) pairs. The
  *     standing corpus is touched only through the index tables; nothing is
  *     re-shingled.
  *   - [[appendDocs]]: after the keep/drop decision, append the survivors'
  *     sets + bands and refresh `counts/` with one aggregation over the
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

  private def writeBands(sigs: DataFrame, dir: String, cfg: MinHashConfig,
      mode: String): Unit = {
    val spark = sigs.sparkSession
    TextDedup.bandRows(sigs, cfg)
      .repartition(spark.sparkContext.defaultParallelism, col("band_key"))
      .sortWithinPartitions(col("band_key"))
      .write.mode(mode).parquet(s"$dir/bands")
  }

  /** Index `corpus` under `dir` (overwrites any previous index). Text is
    * shingled exactly once: the signature frame is written first and the
    * band table derives from the WRITTEN columns (columnar id+sig
    * read-back), never from a second derivation of the text — corpus-scale
    * inputs must not rely on cache residency. */
  def build(corpus: DataFrame, idCol: String, textCol: String, dir: String,
      cfg: MinHashConfig = MinHashConfig()): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    TextDedup.signatures(corpus, idCol, textCol, cfg)
      .filter(size(col("sh")) > 0)
      .write.mode("overwrite").parquet(s"$dir/sets")
    writeBands(spark.read.parquet(s"$dir/sets").select(col("doc_id"), col("sig")),
      dir, cfg, "overwrite")
    refreshCounts(spark, dir)
    // stamp the hash family so a mismatched search fails loudly instead of
    // silently joining foreign bucket keys
    Seq((cfg.shingleK, cfg.numPerm, cfg.bands, cfg.seed, cfg.maxBucket, cfg.portable))
      .toDF("shingle_k", "num_perm", "bands", "seed", "max_bucket", "portable")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Recompute the per-bucket census from the id-only bands table.
    * Band keys are long for the xxhash64 family, string for the portable
    * one — the census preserves whichever type the index uses. */
  private def refreshCounts(spark: SparkSession, dir: String): Unit =
    spark.read.parquet(s"$dir/bands")
      .groupBy(col("band_key")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$dir/counts")

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
    * dedupe on id space.
    *
    * The `maxBucket` cap applies to the COMBINED bucket population (stored
    * census + the arriving batch's own band counts), so a skewed batch —
    * 500 boilerplate docs landing in one bucket — degrades to dropped
    * buckets exactly like [[TextDedup.candidatePairs]]'s census over the
    * union corpus, never to a join blowup; search ≡ transient cross-pairs
    * holds under skew too (TextDedupIndexSpec). The over-cap key set is
    * output-sized (only buckets the batch touches), hence broadcastable. */
  def searchNew(newDocs: DataFrame, dir: String, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val spark = newDocs.sparkSession
    requireMatching(spark, dir, cfg)
    // one derivation of the arriving batch, cached: bands and sets must be
    // consistent views even over a non-deterministic input (e.g. a limit())
    val newSigs = TextDedup.signatures(newDocs, idCol, textCol, cfg)
      .filter(size(col("sh")) > 0)
      .cache()
    val newBands = TextDedup.bandRows(newSigs.select(col("doc_id"), col("sig")), cfg)
    val newSets = newSigs.select(col("doc_id"), col("sh"))
    val corpusCounts = spark.read.parquet(s"$dir/counts")
    val hot = newBands.groupBy(col("band_key")).agg(count(lit(1)).as("n_new"))
      .join(corpusCounts, Seq("band_key"), "left")
      .filter(col("n_new") + coalesce(col("n"), lit(0L)) > cfg.maxBucket)
      .select(col("band_key"))
    val corpusBands = spark.read.parquet(s"$dir/bands")
      .join(broadcast(hot), Seq("band_key"), "left_anti")
    val cand = newBands.join(broadcast(hot), Seq("band_key"), "left_anti")
      .withColumnRenamed("doc_id", "new_id")
      .join(corpusBands.withColumnRenamed("doc_id", "corpus_id"), Seq("band_key"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()
    val corpusSets = spark.read.parquet(s"$dir/sets").select(col("doc_id"), col("sh"))
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

  /** Append (already-deduped) docs to the index and refresh the bucket
    * census. The batch's signature frame is cached (batch-sized, unlike the
    * corpus) so sets and bands are consistent views of ONE derivation even
    * over a non-deterministic input. */
  def appendDocs(newDocs: DataFrame, dir: String, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): Unit = {
    val spark = newDocs.sparkSession
    requireMatching(spark, dir, cfg)
    val sigs = TextDedup.signatures(newDocs, idCol, textCol, cfg)
      .filter(size(col("sh")) > 0)
      .cache()
    try {
      sigs.write.mode("append").parquet(s"$dir/sets")
      writeBands(sigs.select(col("doc_id"), col("sig")), dir, cfg, "append")
      refreshCounts(spark, dir)
    } finally sigs.unpersist()
  }
}
