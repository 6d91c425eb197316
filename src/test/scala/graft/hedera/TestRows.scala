package graft.hedera

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared test fixture: ns-epoch keys → rows under the FULL transactions
  * schema (derived truncated timestamp + day partition, every other column
  * null) — the shape all table-layer/dedupe specs append. One copy here
  * instead of five drifting spec-local variants. */
object TestRows {

  def fullSchemaRows(spark: SparkSession, ns: Seq[Long]): DataFrame = {
    import spark.implicits._
    val df = ns.toDF("consensusTimestamp")
      .withColumn("consensusTimestampTruncated",
        timestamp_micros(expr("consensusTimestamp div 1000")))
      .withColumn("day", to_date(col("consensusTimestampTruncated")))
    df.select(TransactionSchema.table.fieldNames.toIndexedSeq.map(n =>
      if (df.columns.contains(n)) col(n)
      else lit(null).cast(TransactionSchema.table(n).dataType).as(n)): _*)
  }

  def writeDays(spark: SparkSession, table: TransactionsTable, ns: Seq[Long]): Unit =
    table.append(fullSchemaRows(spark, ns))
}
