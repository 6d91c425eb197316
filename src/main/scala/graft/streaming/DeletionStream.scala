package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous right-to-be-forgotten processing — the deployment shape of
  * the per-index deletion lifecycles: forget requests arrive as a stream
  * of ids (a GDPR/DMCA queue, a re-crawl blocklist feed), and each
  * micro-batch fans the batch's id set to every standing index's
  * tombstone path, then appends an audit row per id — the record a
  * compliance review reads ("request X applied to index Y in batch Z at
  * time T").
  *
  * Delivery model (stated, not hidden): every per-index delete is
  * IDEMPOTENT (tombstone appends; re-deleting an absent or already-dead
  * id is a no-op), so a crash-and-replay of a micro-batch converges on
  * the index side; the audit append is the one at-least-once effect — a
  * replayed batch can duplicate audit rows for the same (id, batch_id),
  * exact duplicates a reader drops by key (the ingest dead-letter
  * ledger's documented residue class). Suppression is IMMEDIATE on batch
  * completion (every index reader anti-joins its tombstones); physical
  * removal rides each index's next compaction, which the oversized-delete
  * guards trigger automatically for large waves.
  *
  * Scale shape: per batch, one distinct() over the (small) request batch,
  * one O(batch) tombstone append per index under that index's writer
  * lease, one audit append — nothing corpus-sized on the request path.
  *
  * Reference scope: the reference pipeline has no deletion surface at
  * all (BigQuery rows are append-only there); this is engine extension
  * surface for the governed-corpus lifecycle, composing the three
  * per-index deleteDocs/deleteVectors operators.
  */
object DeletionStream {

  /** Standing indexes a forget request applies to; absent dirs are
    * skipped (a deployment may run text-only or vector-only). */
  final case class Targets(
      retrievalDir: Option[String] = None,
      textDedupDir: Option[String] = None,
      ivfDir: Option[String] = None)

  /** Start the deletion stream over `input` (any streaming DataFrame
    * carrying `idCol`). Audit rows: (id, batch_id, index, applied_us) —
    * one per (request id, target index). `applied_us` is wall-clock µs at
    * apply time (audit metadata, deliberately not part of any oracle). */
  def run(input: DataFrame, targets: Targets, auditDir: String,
      checkpointDir: String, idCol: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // one consistent id set for all three index writes + the audit
          val ids = batch.select(col(idCol).cast("long").as(idCol))
            .distinct().localCheckpoint()
          val applied = Seq.newBuilder[String]
          targets.retrievalDir.foreach { d =>
            graft.retrieval.RetrievalIndex.deleteDocs(ids, d, idCol)
            applied += "retrieval"
          }
          targets.textDedupDir.foreach { d =>
            graft.dedup.TextDedupIndex.deleteDocs(ids, d, idCol)
            applied += "textdedup"
          }
          targets.ivfDir.foreach { d =>
            graft.similarity.IvfIndex.deleteVectors(ids, d, idCol)
            applied += "ivf"
          }
          val nowUs = System.currentTimeMillis() * 1000L
          ids.select(col(idCol),
              lit(batchId).as("batch_id"),
              explode(lit(applied.result().toArray)).as("index"),
              lit(nowUs).as("applied_us"))
            .write.mode("append").parquet(auditDir)
        }
        ()
      }
      .start()
}
