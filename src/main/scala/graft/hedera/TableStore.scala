package graft.hedera

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table layer for the warehouse: day-partitioned fact table,
  * append-only errors table, tiny atomically-swapped state table.
  *
  * Layout = the reference's physical design re-expressed for parquet
  * (SURVEY.md §1.4): DAY partitions on the truncated timestamp
  * (scripts/create-tables.sh:14-15) become `day=` directory partitions —
  * filters on `day` prune at the source listing, which is the property that
  * keeps incremental dedupe O(window) instead of O(table) at 100 TB.
  * "Clustering on transactionType" (create-tables.sh:16) becomes
  * `sortWithinPartitions(transactionType)` at write: parquet row-group
  * min/max stats then skip row groups for type-filtered queries.
  */
final class TransactionsTable(spark: SparkSession, path: String, filesPerDay: Int = 4) {

  def read(): DataFrame = spark.read.schema(TransactionSchema.table).parquet(path)

  def exists(): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Write layout: cluster rows to ≤`filesPerDay` files per day partition
    * (repartition on day + bounded salt — without this, an N-partition
    * upstream × D days batch writes N·D splinter files, and every later
    * table scan pays the open cost), then sort within files by
    * transactionType so parquet row-group min/max stats give the
    * clustering-based skipping the reference gets from BigQuery clustering
    * (scripts/create-tables.sh:16). */
  private def layout(df: DataFrame): DataFrame =
    df.repartition(col("day"), pmod(xxhash64(col("consensusTimestamp")), lit(filesPerDay)))
      .sortWithinPartitions(col("day"), col("transactionType"))

  /** Append a batch, day-partitioned, clustered within partitions. */
  def append(df: DataFrame): Unit =
    layout(df).write.mode(SaveMode.Append).partitionBy("day").parquet(path)

  /** Replace exactly the `day=` partitions present in `df` — the engine's
    * MERGE-ON-FALSE (RemoveDuplicatesTemplateQuery.java:29-43): with
    * partitionOverwriteMode=dynamic only affected partitions rewrite. */
  def overwriteDays(df: DataFrame): Unit =
    layout(df).write.mode(SaveMode.Overwrite).partitionBy("day").parquet(path)
}

final class ErrorsTable(spark: SparkSession, path: String) {
  def read(): DataFrame = spark.read.schema(TransactionSchema.errors).parquet(path)
  /** Dead letters are never dropped (BigQueryErrorsSink.java:43-47 parity:
    * alwaysRetry) — append-only. */
  def append(df: DataFrame): Unit = df.write.mode(SaveMode.Append).parquet(path)
}

/** Key-value job-state table with MERGE-upsert semantics
  * (GetStateQuery/SetStateQuery — AbstractDeduplication.java:99,
  * SetStateQuery.java:34-51). Tiny by construction (a handful of
  * checkpoints), so each upsert rewrites it via write-new-then-swap, which
  * on a real cluster FS is the atomic-rename pattern.
  */
final class StateStore(spark: SparkSession, path: String) {
  import spark.implicits._

  def readAll(): Map[String, String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Map.empty
    else spark.read.schema(TransactionSchema.state).parquet(path)
      .as[(String, Option[String])].collect()
      .map { case (k, v) => k -> v.orNull }.toMap
  }

  def get(name: String): Option[String] = readAll().get(name)

  /** MERGE-upsert one key (SetStateQuery.java:34-40 semantics). */
  def set(name: String, value: String): Unit = {
    val updated = readAll() + (name -> value)
    val df = updated.toSeq.toDF("name", "value")
    val tmp = path + ".tmp"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val p = new Path(path)
    val t = new Path(tmp)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(t, p)
  }
}
