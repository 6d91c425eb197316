package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (hash-clustered) table layout — the shuffle-elimination lever
  * for REPEATED same-key joins and aggregations at 100 TB.
  *
  * Spark's native V1 bucketing hash-partitions rows into a fixed number of
  * buckets by the bucket columns AT WRITE TIME and records the layout in
  * the catalog. Every later join or aggregation whose keys match the
  * bucket spec reads the layout as an already-satisfied
  * ClusteredDistribution: no Exchange on the bucketed side(s), and with
  * `sortCols` = join keys no Sort either — a 100 TB fact table joined
  * daily against its dedup candidates pays the shuffle ONCE at layout
  * time instead of per query. (This is the relational sibling of
  * ZOrderLayout: z-order buys scan PRUNING on range predicates; bucketing
  * buys shuffle ELIMINATION on equi-keys. The two compose — bucket by the
  * join key, z-order within buckets.)
  *
  * BucketedLayoutSpec pins the plans: bucketed⋈bucketed carries ZERO
  * shuffle exchanges (vs ≥2 for the same join on plain parquet), and a
  * bucket-key aggregation runs exchange-free.
  *
  * Bucket COUNT is a layout contract: both join sides must agree (or be
  * integer multiples under bucket coalescing). Pick it for the target
  * deployment's task granularity — at 100 TB, buckets ≈ cluster cores ×
  * small constant; the test default mirrors the session's shuffle
  * parallelism.
  */
object BucketedLayout {

  /** Write `df` as a bucketed external table at `path`, registered in the
    * session catalog as `table` (in-memory catalog: the registration is
    * per-session; the FILES carry the layout, re-register on a new session
    * with the same spec). Overwrites both registration and files. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    require(nBuckets >= 1 && nBuckets <= 100000,
      s"nBuckets $nBuckets outside [1, 100000]")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata attached — joins and
    * aggregations on the bucket key skip their Exchange). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
