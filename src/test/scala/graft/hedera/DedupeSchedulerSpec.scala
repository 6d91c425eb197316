package graft.hedera

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark
import graft.metrics.{Metrics, MetricsRegistry}

/** Fixed-rate dedupe orchestration: ticks run the jobs, failures are
  * contained (the next tick retries from saved state), and run metrics come
  * from the Job exactly once — not double-counted by the scheduler.
  */
class DedupeSchedulerSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def mkJob(reg: MetricsRegistry): (TransactionsTable, Deduplication.Job, String) = {
    val dir = GraftTestSpark.tmpDir("sched")
    val table = new TransactionsTable(spark, s"$dir/t")
    val state = new StateStore(spark, s"$dir/s")
    (table, new Deduplication.Job(spark, table, state, reg = reg), dir)
  }

  private def writeRows(table: TransactionsTable, ns: Seq[Long]): Unit =
    TestRows.writeDays(spark, table, ns)

  test("runOnceNow dedupes and records each invocation exactly once") {
    val reg = new MetricsRegistry
    val (table, job, _) = mkJob(reg)
    val t0 = 1600000000L * 1000000000L
    writeRows(table, Seq(t0, t0, t0 + 1))
    val sched = new DedupeScheduler(job)
    val (inc, full) = sched.runOnceNow()
    assert(inc.duplicatesRemoved === 1)
    assert(full.duplicatesRemoved === 0)
    assert(table.read().count() === 2)
    // one incremental + one full invocation, counted by the Job only
    assert(reg.get(Metrics.DedupeInvocations) === 2)
    assert(reg.get(Metrics.DedupeDelay) > 0) // 2020 window end vs now
    sched.stop()
  }

  test("a failing tick is contained and does not kill the scheduler thread") {
    val reg = new MetricsRegistry
    val dir = GraftTestSpark.tmpDir("sched-fail")
    // table path that exists as a FILE → job read fails
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/t"), "junk")
    val job = new Deduplication.Job(spark,
      new TransactionsTable(spark, s"$dir/t"),
      new StateStore(spark, s"$dir/s"), reg = reg)
    val sched = new DedupeScheduler(job, incrementalRateMs = 10, fullRateMs = 100000)
    sched.start()
    // Poll, don't sleep a fixed interval: the tick's Spark job can take
    // well over 300 ms to fail under a loaded suite JVM, and asserting
    // mid-flight reads the counter before `counted` increments it.
    val deadline = System.currentTimeMillis() + 60000
    while (reg.get(Metrics.DedupeFailures) == 0 &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    sched.stop()
    assert(reg.get(Metrics.DedupeFailures) > 0, "failures must be counted")
  }
}
