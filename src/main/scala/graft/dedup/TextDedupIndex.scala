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

  // ---- continuous curation -------------------------------------------------
  //
  // The deployed shape of the index: documents arrive as a stream, each
  // micro-batch is collapsed to its intra-batch near-dup survivors
  // (cluster-keep-min, the t_minhash_dedup rule), deduped against the
  // STANDING corpus through the index, and the remainder is emitted to the
  // curated output and appended to the index — so later batches dedupe
  // against everything kept so far. Index maintenance assumes a single
  // curator process (one stream owns build/append/counts, like one dedupe
  // job owns the fact table's repair); concurrent READERS are safe on any
  // completed state, and a multi-curator deployment would serialize on a
  // lease exactly like TransactionsTable's writers.

  /** Compute a batch's curation survivors and MATERIALIZE them to a staging
    * dir before anything mutates the index. The survivors plan reads the
    * index tables (through [[searchNew]]) and the append that follows
    * writes them — an unmaterialized frame re-evaluated after the append
    * would match every survivor against itself and drop it. Correctness
    * must not depend on cache residency, so this is a staged write, not a
    * cache(). Returns the read-back frame and the staging path (caller
    * deletes it once the rows are persisted elsewhere; orphans from
    * crashed attempts are inert and may be garbage-collected). */
  private def stageSurvivors(batch: DataFrame, dir: String, idCol: String,
      textCol: String, cfg: MinHashConfig): (DataFrame, String) = {
    val spark = batch.sparkSession
    requireMatching(spark, dir, cfg)
    val intra = TextDedup.minHashDedup(batch, idCol, textCol, cfg)
    val matched = searchNew(intra, dir, idCol, textCol, cfg)
      .select(col("new_id").as(idCol)).distinct()
    val survivors = intra.join(matched, Seq(idCol), "left_anti")
    val stage = s"$dir/staging/${java.util.UUID.randomUUID()}"
    survivors.write.mode("overwrite").parquet(stage)
    (spark.read.parquet(stage), stage)
  }

  /** One curation step in batch form: intra-batch near-dup collapse
    * (cluster keep-min), drop docs matching the standing index, append the
    * survivors, return them (reader-stable: backed by the staging dir, not
    * by the mutated index). */
  def curateBatch(batch: DataFrame, dir: String, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val (staged, _) = stageSurvivors(batch, dir, idCol, textCol, cfg)
    appendDocs(staged, dir, idCol, textCol, cfg)
    staged
  }

  /** Continuous curation: run [[curateBatch]] per micro-batch of `input`
    * (any streaming DataFrame with `idCol`/`textCol`), emitting survivors
    * to `outDir`. Same delivery model as the ingest pipeline: at-least-once
    * with a batch-id ledger. The body orders out-write BEFORE index-append,
    * so every crash window replays safely — before the out-write the replay
    * redoes the whole batch; between out-write and append the replay
    * re-emits the same rows (exact duplicates by id, the documented
    * at-least-once residue); after the append the replayed survivors all
    * match their indexed selves and the batch becomes a no-op. */
  def curateStream(input: DataFrame, dir: String, outDir: String,
      checkpointDir: String, idCol: String, textCol: String,
      cfg: MinHashConfig = MinHashConfig(),
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val ledger = new org.apache.hadoop.fs.Path(s"$checkpointDir/graft-curate-ledger")
        val fs = ledger.getFileSystem(spark.sessionState.newHadoopConf())
        val mark = new org.apache.hadoop.fs.Path(ledger, f"batch-$id%020d")
        if (!fs.exists(mark)) {
          val (staged, stage) = stageSurvivors(batch, dir, idCol, textCol, cfg)
          staged.write.mode("append").parquet(outDir)
          appendDocs(staged, dir, idCol, textCol, cfg)
          fs.mkdirs(ledger)
          fs.create(mark, true).close()
          fs.delete(new org.apache.hadoop.fs.Path(stage), true)
        }
        ()
      }
      .start()
}
