package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shingles

/** Data Selection via Importance Resampling (the published hashed-n-gram
  * DSIR estimator): score every document by how much more likely its
  * n-gram profile is under a TARGET distribution (e.g. curated/wiki-like
  * text) than under the RAW corpus distribution, so a training-data
  * pipeline can resample raw data toward the target domain. The reference
  * ETL has no counterpart — this is part of the training-data extension
  * family, alongside the quality/trigram-LM scorers it complements (those
  * score fluency against a fixed model; DSIR scores DOMAIN MATCH between
  * two corpus slices).
  *
  * Estimator: features are hashed word uni+bigrams folded into `buckets`
  * counts; the target and raw bucket distributions get add-1 smoothing;
  * a document's log importance weight is the sum over its grams of
  * `ln p_target(bucket) − ln p_raw(bucket)`.
  *
  * Spark shape and the 100 TB story:
  *  - One corpus pass explodes grams to `(doc, bucket, is_target)`; the
  *    bucket statistics aggregate is BOUNDED BY `buckets` (both splits
  *    counted in one pass — never two corpus scans), so the stats shuffle
  *    carries at most `buckets` rows per map partition regardless of
  *    corpus size.
  *  - The per-gram scoring join broadcasts the stats frame — sound at ANY
  *    corpus size because its cardinality is the `buckets` parameter
  *    (same bounded-broadcast reasoning as the 2¹⁶-bucket Bloom
  *    prefilter), not a corpus statistic like the trigram model.
  *  - Per-doc summation partial-aggregates `(doc, micro-weight)` longs.
  *
  * Exactness discipline: the per-BUCKET log-ratio is rounded once to
  * 1e-6 (micro) and carried as an exact long, so the per-doc cross-row
  * sum is integer arithmetic — order-independent and engine-portable.
  * Rounding per bucket (≤ `buckets` values) instead of per gram keeps
  * the chance of a last-ulp libm straddle at a rounding boundary
  * ~corpus-independent (a per-gram 1e-9 grid would take that bet once
  * per gram — millions of times at sf0.1).
  */
object DsirWeights {

  /** Per-document DSIR log importance weights:
    * `(id, n_grams, logw)` — `n_grams` the document's uni+bigram count,
    * `logw` the summed log-ratio (micro-exact, 6 dp). Documents whose
    * text yields no grams (null text) drop out (no evidence either way —
    * callers wanting them keep a left join on the id). */
  def logImportanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val lowered = lower(col(textCol))
    // Spread documents before the ~2·tokens× gram explode + per-gram md5
    // (the SpanDedup lesson: a coarse scan otherwise pins the expansion
    // hash on a few tasks; the spread costs one corpus-bandwidth shuffle,
    // far below the hash work it parallelizes).
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val grams = docs
      .repartition(par, col(idCol))
      .select(col(idCol), isTarget.as("tgt"),
        explode(concat(shingles(lowered, 1), shingles(lowered, 2))).as("g"))
      .select(col(idCol), col("tgt"),
        pmod(graft.functions.TextFunctions.portableHash60(
          concat(lit("dsir:"), col("g"))), lit(buckets.toLong)).as("bkt"))
    val stats = grams.groupBy(col("bkt")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    val totals = stats.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    // ln((ct+1)/(nt+B)) − ln((cr+1)/(nr+B)), rounded ONCE per bucket to an
    // exact micro long (see object doc for why per-bucket, not per-gram).
    val bucketW = stats.crossJoin(broadcast(totals))
      .select(col("bkt"),
        floor((log((col("ct").cast("double") + 1.0) /
                   (col("nt").cast("double") + buckets.toDouble)) -
               log((col("cr").cast("double") + 1.0) /
                   (col("nr").cast("double") + buckets.toDouble))) * 1e6 + 0.5)
          .cast("long").as("wmicro"))
    grams.join(broadcast(bucketW), Seq("bkt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        (sum(col("wmicro")).cast("double") / 1e6).as("logw"))
  }
}
