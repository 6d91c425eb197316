package graft.hedera

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Drives the application entry point end-to-end in `--once` mode over a
  * generated corpus with planted duplicates: ingest drains the input,
  * dedupe repairs the planted dupes, re-running on the same checkpoint is
  * a no-op (replay ledger), and arg parsing rejects garbage. */
class EtlAppSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("arg parsing: required args, defaults, unknown flags") {
    val a = EtlApp.parse(Array("--input", "/i", "--warehouse", "/w", "--once"))
    assert(a.once && a.input == "/i" && a.checkpoint == "/w/checkpoint")
    assert(a.incrementalMs == 300000L && a.fullMs == 86400000L && !a.preDedupe)
    intercept[IllegalArgumentException](EtlApp.parse(Array("--input", "/i")))
    intercept[IllegalArgumentException](EtlApp.parse(Array("--bogus")))
  }

  test("--once pipeline: drain input, dedupe planted duplicates, idempotent rerun") {
    val base = GraftTestSpark.tmpDir("graft-etlapp")
    val in = s"$base/in"
    val rows = graft.PipelineBench.jsonCorpus(spark, GraftTestSpark.sfDir, in)
    assert(rows > 0)

    // The corpus generator duplicates every 5th row; after ingest + dedupe
    // the fact table must hold exactly the distinct keys.
    val warehouse = s"$base/wh"
    val table = new TransactionsTable(spark, s"$warehouse/transactions")
    val errors = new ErrorsTable(spark, s"$warehouse/errors")
    val state = new StateStore(spark, s"$warehouse/state")
    val pipe = new IngestPipeline(spark, table, errors, preDedupe = false)
    // same wiring as EtlApp --once: unbounded catch-up (backfill semantics)
    val job = new Deduplication.Job(spark, table, state,
      Deduplication.Config(catchupIntervalUs = Long.MaxValue / 4))

    val q = pipe.startStream(in, s"$warehouse/checkpoint",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    val (inc, full) = new DedupeScheduler(job).runOnceNow()
    val landed = table.read().count()
    val distinctKeys = table.read().select("consensusTimestamp").distinct().count()
    assert(inc.duplicatesRemoved + full.duplicatesRemoved > 0,
      "planted duplicates must be removed")
    assert(landed == distinctKeys, "post-dedupe table holds one row per key")

    // Re-running the drained stream appends nothing (checkpoint + ledger).
    val q2 = pipe.startStream(in, s"$warehouse/checkpoint",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q2.awaitTermination()
    assert(table.read().count() == landed, "replay of a drained input is a no-op")
  }
}
