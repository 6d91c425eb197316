package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.portableHash60

/** Content-addressed corpus snapshot diff — the dataset-versioning
  * primitive a training-data pipeline needs between crawls/releases:
  * which documents were ADDED, REMOVED, or CHANGED from snapshot A to
  * snapshot B, decided by a content fingerprint rather than timestamps
  * (mtimes lie across re-crawls; content doesn't).
  *
  * Scale shape: each snapshot collapses to (id, 60-bit content hash)
  * BEFORE the comparison — the full-outer join carries two longs per
  * document, never the text (at 100 TB the diff shuffles ~GBs). The join
  * is id-keyed equi (co-partitionable, AQE-handled); `unchanged` rows —
  * the overwhelming majority between adjacent snapshots — are dropped
  * IN the post-join stage (a row's status needs both sides, so the
  * filter necessarily sits above the join's shuffle — but that shuffle
  * carries only the two-long fingerprints), so the OUTPUT is delta-sized.
  * The fingerprint is the portable md5-prefix hash, so the whole diff is
  * engine-replayable (full DuckDB oracle on the registry entry).
  *
  * Reference scope: the reference pipeline versions nothing (BigQuery
  * tables are mutated in place); this extends the engine for reproducible
  * dataset releases — diff two releases, audit what moved.
  */
object CorpusDiff {

  /** (id, status, fp_prev, fp_cur) for every id whose content differs
    * between the snapshots — `status ∈ {added, removed, changed}`;
    * unchanged ids emit nothing. Fingerprints are null ONLY on the side
    * where the id is absent: a null text hashes through a tagged preimage
    * ("0" prefix vs "1"+text), so null-in-both is unchanged, null-vs-text
    * is changed, and a null fingerprint can never be mistaken for a
    * missing row (which is what a raw hash(null)=null would do —
    * reporting the same never-changing document as 'added' on every
    * release). */
  def diff(prev: DataFrame, cur: DataFrame, idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).cast("long").as(idCol),
        portableHash60(
          when(col(textCol).isNull, lit("0"))
            .otherwise(concat(lit("1"), col(textCol)))).as(as))
    val joined = fp(prev, "fp_prev")
      .join(fp(cur, "fp_cur"), Seq(idCol), "full_outer")
    val status: Column =
      when(col("fp_prev").isNull, lit("added"))
        .when(col("fp_cur").isNull, lit("removed"))
        .when(col("fp_prev") =!= col("fp_cur"), lit("changed"))
    joined
      .withColumn("status", status)
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"), col("fp_prev"), col("fp_cur"))
  }

  /** Summary counts per status — the release-gate number ("this crawl
    * changed 40 % of the corpus — investigate before training"). */
  def diffStats(prev: DataFrame, cur: DataFrame, idCol: String, textCol: String): DataFrame =
    diff(prev, cur, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
