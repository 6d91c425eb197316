package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated test tables (TESTDATA.md): one parquet per
  * table under a scale-factor directory. Column pruning + predicate pushdown
  * reach the parquet scan through the plain `spark.read.parquet` path, so this
  * is already the 100 TB-shaped access path (swap the dir for a warehouse
  * root; nothing else changes).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTime(df) else df
  }

  /** The engine's event-time discipline is the reference's: `ts` is a raw
    * nanosecond long — the identity/ordering key — and every coarser view
    * (µs, seconds, days) is an explicit floor derivation (reference:
    * TransactionJsonToTableRow.java:57-58 keeps consensusTimestamp as the
    * raw long and derives the truncated TIMESTAMP). The generator has
    * shipped `ts` both as parquet TIMESTAMP(NANOS) — read as a ns long via
    * `nanosAsLong` — and as TIMESTAMP(MICROS) — read as TIMESTAMP_NTZ.
    * Normalize either physical form to the ns long here so downstream
    * derivations keep a single code path and the DuckDB oracle image
    * (`epoch_us(ts)` = `ts div 1000`) is schema-independent. The NTZ→LTZ
    * cast is epoch-exact because the session timezone is pinned UTC
    * (GraftSession). */
  private def normalizeEventTime(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case _ => df
    }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
