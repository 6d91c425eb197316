package graft.hedera

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The reference's dead-letter contract is NEVER-DROP
  * (BigQueryErrorsSink.java:43-47 — alwaysRetry): a failed insert retries
  * until it lands. The Spark ingest appends fact rows then error rows
  * non-atomically, so the batch entry point must make that window
  * recoverable — this spec INJECTS the crash between the two appends and
  * proves the ledgered entry point loses no error row across the retry,
  * while the duplicated fact rows stay repairable (at-least-once, the
  * delivery model the dedupe jobs are built on). */
class IngestCrashSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private val lines = Seq(
    """{"consensusTimestamp":86400000000001,"transactionType":14}""",
    """{"consensusTimestamp":86400000000002,"transactionType":7}""",
    """{"consensusTimestamp":86400000000003,"transaction":"not-a-struct"}""",
    """not json at all""")

  private def writeInput(base: String): Unit = {
    import spark.implicits._
    lines.toDF("value").coalesce(1).write.text(s"$base/in")
  }

  /** ErrorsTable whose Nth append throws — the crash lands exactly in the
    * fact-append → error-append window (fact rows already committed). */
  private final class FaultyErrors(path: String, failOnCall: Int)
      extends ErrorsTable(spark, path) {
    val calls = new AtomicInteger(0)
    override def append(df: DataFrame): Unit = {
      if (calls.getAndIncrement() == failOnCall)
        throw new RuntimeException("injected crash between fact and error append")
      super.append(df)
    }
  }

  test("crash between fact and dead-letter append: the retry loses no error row") {
    val base = GraftTestSpark.tmpDir("ingest-crash")
    writeInput(base)
    val table = new TransactionsTable(spark, s"$base/t")
    val errors = new FaultyErrors(s"$base/e", failOnCall = 0)
    val pipe = new IngestPipeline(spark, table, errors)
    val ledger = s"$base/ledger"

    // run 1: fact rows land, then the error append crashes → no done-mark
    val e = intercept[RuntimeException] { pipe.ingestBatchOnce(s"$base/in", ledger) }
    assert(e.getMessage.contains("injected crash"))
    assert(table.read().count() === 2, "fact rows committed before the crash")
    assert(!new java.io.File(s"$base/e").exists(),
      "the crash window: error rows missing entirely")

    // run 2 (the operator's unconditional retry): no mark → full replay;
    // this time the error append succeeds
    val (ok2, bad2) = pipe.ingestBatchOnce(s"$base/in", ledger)
    assert(ok2 === 2 && bad2 === 2)
    assert(errors.read().count() === 2, "never-drop: both dead letters landed")
    // fact table is at-least-once across the replay: every row present,
    // duplicates bounded by the replay (repairable by the dedupe jobs)
    val facts = table.read()
    assert(facts.select("consensusTimestamp").distinct().count() === 2)
    assert(facts.count() === 4, "one replay → exactly one duplicate per row")

    // the dedupe repair converges the fact table back to exactly-once
    val state = new StateStore(spark, s"$base/state")
    val job = new Deduplication.Job(spark, table, state)
    job.runIncremental()
    assert(table.read().count() === 2, "dedupe repaired the replayed rows")
    assert(errors.read().count() === 2, "repair never touches dead letters")

    // run 3: mark present → no-op; nothing is appended anywhere
    val (ok3, bad3) = pipe.ingestBatchOnce(s"$base/in", ledger)
    assert(ok3 === 0 && bad3 === 0)
    assert(table.read().count() === 2 && errors.read().count() === 2)
  }

  test("clean ledgered batch: one run, one mark, second run is a no-op") {
    val base = GraftTestSpark.tmpDir("ingest-clean")
    writeInput(base)
    val table = new TransactionsTable(spark, s"$base/t")
    val errors = new ErrorsTable(spark, s"$base/e")
    val pipe = new IngestPipeline(spark, table, errors)
    val ledger = s"$base/ledger"
    val (ok, bad) = pipe.ingestBatchOnce(s"$base/in", ledger)
    assert(ok === 2 && bad === 2)
    val (ok2, bad2) = pipe.ingestBatchOnce(s"$base/in", ledger)
    assert(ok2 === 0 && bad2 === 0)
    assert(table.read().count() === 2 && errors.read().count() === 2)
  }
}
