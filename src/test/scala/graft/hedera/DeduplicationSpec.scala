package graft.hedera

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Dedupe-job behavior, mirroring the reference's integration scenarios
  * (IncrementalIntegrationTest.java:112-157) with its generator recipe
  * (testhelper/TransactionsGenerator.java:55-91): rows with random ≤1s ns
  * inter-arrival, every 5th duplicated; dedupe restores the unique count and
  * advances the checkpoint; a gap larger than the catch-up interval
  * converges over multiple runs; dedupe is idempotent.
  */
class DeduplicationSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  /** Reference generator: n unique rows from startNs, every 5th duplicated. */
  private def genRows(n: Int, startNs: Long, seed: Int = 7): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    var ts = startNs
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    for (i <- 1 to n) {
      ts += 1 + rnd.nextInt(1000000000)
      out += ts
      if (i % 5 == 0) out += ts // duplicate every 5th
    }
    out.toSeq
  }

  private def writeRows(table: TransactionsTable, ns: Seq[Long]): Unit =
    TestRows.writeDays(spark, table, ns)

  private def mkJob(): (TransactionsTable, StateStore, Deduplication.Job) = {
    val dir = GraftTestSpark.tmpDir("dedupe")
    val table = new TransactionsTable(spark, s"$dir/transactions")
    val state = new StateStore(spark, s"$dir/state")
    (table, state, new Deduplication.Job(spark, table, state))
  }

  test("testDeduplication semantics: 100 rows + 20 dups -> 100, checkpoint advances") {
    val (table, state, job) = mkJob()
    val rows = genRows(100, startNs = 1600000000L * 1000000000L)
    assert(rows.size === 120)
    writeRows(table, rows)
    val res = job.runIncremental()
    assert(res.duplicateGroups === 20)
    assert(res.duplicatesRemoved === 20)
    assert(table.read().count() === 100)
    assert(table.read().select(countDistinct(col("consensusTimestamp"))).first().getLong(0) === 100)
    val ckpt = state.get(Deduplication.IncrementalStateKey).get.toLong
    assert(ckpt === res.windowEndUs)
    assert(ckpt > 0)
  }

  test("dedupe is idempotent: second run finds nothing and moves on") {
    val (table, state, job) = mkJob()
    writeRows(table, genRows(50, startNs = 1600000000L * 1000000000L))
    job.runIncremental()
    val before = table.read().count()
    val res2 = job.runIncremental()
    assert(res2.duplicatesRemoved === 0)
    assert(table.read().count() === before)
  }

  test("testGap semantics: chunks separated by >catch-up converge over runs") {
    val (table, state, job) = mkJob()
    val day = 86400L * 1000000000L
    writeRows(table, genRows(50, startNs = 1600000000L * 1000000000L))
    writeRows(table, genRows(50, startNs = 1600000000L * 1000000000L + 10 * day, seed = 8))
    var guard = 0
    var last = -1L
    while (guard < 10 && {
      val r = job.runIncremental(); last = r.windowEndUs; r.windowEndUs != r.windowStartUs
    }) guard += 1
    // all duplicates repaired across the gap
    assert(table.read().count() === 100)
    val maxUs = table.read()
      .agg(max(unix_micros(col("consensusTimestampTruncated")))).first().getLong(0)
    assert(state.get(Deduplication.IncrementalStateKey).get.toLong === maxUs)
  }

  test("full dedupe repairs late duplicates behind the incremental checkpoint") {
    val (table, state, job) = mkJob()
    val rows = genRows(40, startNs = 1600000000L * 1000000000L)
    writeRows(table, rows)
    job.runIncremental()
    assert(table.read().count() === 40)
    // late duplicate arrival of an early row (behind the checkpoint)
    writeRows(table, Seq(rows.head))
    assert(table.read().count() === 41)
    val res = job.runFull()
    assert(res.duplicatesRemoved === 1)
    assert(table.read().count() === 40)
  }

  test("window scans partition-prune on the day directory column") {
    val (table, _, job) = mkJob()
    val day = 86400L * 1000000000L
    writeRows(table, genRows(20, startNs = 1600000000L * 1000000000L))
    writeRows(table, Seq(1600000000L * 1000000000L + 40 * day)) // far-away day
    val loUs = 1600000000L * 1000000L
    val scan = job.windowScan(loUs, loUs + 86400L * 1000000)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"expected day partition filters in:\n$plan")
    // WITHIN the surviving day directories, the µs window predicate
    // (written on unix_micros(consensusTimestampTruncated)) must also
    // reach the scan as raw-timestamp bounds (DerivedTimeFilterPushdown),
    // so row-group statistics prune inside a day — the second pruning
    // level the 100 TB windowed repair relies on.
    // (the rendered PushedFilters list truncates with "..." — assert the
    // lower bound there and both raw bounds in the Filter condition)
    assert(plan.contains("GreaterThanOrEqual(consensusTimestampTruncated,") &&
      "consensusTimestampTruncated#\\d+ >= ".r.findFirstIn(plan).isDefined &&
      "consensusTimestampTruncated#\\d+ <= ".r.findFirstIn(plan).isDefined,
      s"µs window not pushed as raw timestamp bounds in:\n$plan")
    // the far-away day contributes nothing and its directory is pruned
    // (20 generated rows + 4 every-5th duplicates land in the window)
    assert(scan.count() === 24)
  }

  test("repair only rewrites affected day partitions") {
    val (table, _, job) = mkJob()
    val day = 86400L * 1000000000L
    val d1 = genRows(20, startNs = 1600000000L * 1000000000L)
    val d2 = Seq(1600000000L * 1000000000L + 30 * day + 123L) // clean far-away day
    writeRows(table, d1)
    writeRows(table, d2)
    job.runIncremental()
    assert(table.read().count() === 21)
  }
}
