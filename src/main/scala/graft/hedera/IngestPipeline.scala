package graft.hedera

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingest pipeline: JSON lines → transform → day-partitioned fact table +
  * dead-letter errors table. Batch and Structured Streaming entry points
  * share one `foreachBatch` body, so the streaming path is exactly the
  * batch path applied per micro-batch (PubSubToBigQueryPipeline.java:37-55
  * re-expressed; checkpointing gives the exactly-once the reference
  * approximates with insert-retries + later dedupe — README.md:21-22).
  *
  * Optional `preDedupe` reproduces S1's `withIdAttribute(consensusTimestamp)`
  * broker dedup (PubSubToBigQueryPipeline.java:41) as a within-batch
  * dropDuplicates — best-effort, exactly like the original; the periodic
  * dedupe jobs remain the guarantee.
  */
final class IngestPipeline(
    spark: SparkSession,
    table: TransactionsTable,
    errors: ErrorsTable,
    preDedupe: Boolean = true) {

  private def writeBatch(raw: DataFrame): (Long, Long) = {
    val (typed, bad) = TransactionTransform.parse(raw)
    val out = if (preDedupe) typed.dropDuplicates("consensusTimestamp") else typed
    val cached = out.cache()
    try {
      val n = cached.count()
      table.append(cached)
      val badCached = bad.cache()
      try {
        val nBad = badCached.count()
        if (nBad > 0) errors.append(badCached)
        (n, nBad)
      } finally badCached.unpersist()
    } finally cached.unpersist()
  }

  /** Batch ingest of a directory of JSONL files. */
  def ingestBatch(inputDir: String): (Long, Long) =
    writeBatch(spark.read.text(inputDir))

  /** Streaming ingest: file source + checkpoint → exactly-once appends. */
  def startStream(inputDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.text(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) => writeBatch(batch); () }
      .start()
}
