package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated test tables (TESTDATA.md): one parquet per
  * table under a scale-factor directory. Column pruning + predicate pushdown
  * reach the parquet scan through the plain `spark.read.parquet` path, so this
  * is already the 100 TB-shaped access path (swap the dir for a warehouse
  * root; nothing else changes).
  *
  * Every scan routes through [[graft.sources.SchemaEvolution.normalize]]:
  * physical-schema drift (the events.ts TIMESTAMP(NANOS) → TIMESTAMP(MICROS,
  * NTZ) regeneration that broke round 6 is the canonical example) is either
  * losslessly widened to the canonical logical schema or rejected with one
  * loud, named error at the scan — never a silent value change. The engine's
  * event-time discipline is the reference's: `ts` stays a raw nanosecond
  * long (TransactionJsonToTableRow.java:57-58 keeps consensusTimestamp as
  * the raw long) and every coarser view is an explicit floor derivation, so
  * the DuckDB oracle image (`epoch_us(ts)` = `ts div 1000`) is
  * schema-independent.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.SchemaEvolution.normalize(
      name, spark.read.parquet(s"$dir/$name.parquet"))

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
