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

  private def writeDays(table: TransactionsTable, ns: Seq[Long]): Unit =
    TestRows.writeDays(spark, table, ns)

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

  test("append landing between snapshot and swap survives the day rewrite") {
    val (table, _) = mkTable()
    writeDays(table, Seq(t0, t0, t0 + 1)) // duplicate at t0
    val (snapDf, snapshot) = table.readSnapshot()
    val kept = snapDf.dropDuplicates("consensusTimestamp")
    // a concurrent micro-batch lands AFTER the snapshot, same day
    writeDays(table, Seq(t0 + 2))
    table.overwriteDays(kept, Some(snapshot))
    val keys = table.read().select("consensusTimestamp").as[Long].collect().sorted
    assert(keys.toSeq === Seq(t0, t0 + 1, t0 + 2),
      "dup removed, post-snapshot straggler preserved")
  }

  test("snapshot reads keep day-partition pruning (repair stays O(window))") {
    val (table, _) = mkTable()
    writeDays(table, Seq(t0, t0 + dayNs, t0 + 2 * dayNs))
    val (df, listing) = table.readSnapshot()
    assert(listing.size === 3, "one listing entry per day partition")
    val filtered = df.filter(col("day") === to_date(timestamp_micros(lit(t0 / 1000))))
    val plan = filtered.queryExecution.executedPlan.toString
    // the day predicate must be a PARTITION filter on the explicit-file
    // scan — basePath gives the listed files their day column, and pruning
    // is what keeps the windowed repair O(window) on a 100 TB table
    assert(plan.contains("PartitionFilters: [") && plan.contains("(day"),
      s"day filter did not reach partition pruning:\n${plan.take(800)}")
    assert(filtered.count() === 1)
  }

  test("recovery finishes straggler preservation after a crash mid-swap") {
    val (table, dir) = mkTable()
    writeDays(table, Seq(t0, t0 + 1))
    val liveDay = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.startsWith("day=")).minBy(_.getName)
    val oldNames = fs.listStatus(liveDay).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    // step 1 happened: live -> bak (backup carries a straggler appended
    // after the snapshot — mint a real parquet file for it)
    fs.mkdirs(new Path(dir, ".graft-bak"))
    assert(fs.rename(liveDay, new Path(dir, ".graft-bak/" + liveDay.getName)))
    val (stag, stagDir) = mkTable()
    writeDays(stag, Seq(t0 + 2))
    val stagFile = fs.listStatus(fs.listStatus(new Path(stagDir)).map(_.getPath)
        .filter(_.getName.startsWith("day=")).head)
      .map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith(".")).head
    assert(fs.rename(stagFile,
      new Path(dir, ".graft-bak/" + liveDay.getName + "/straggler.parquet")))
    // manifest written before the renames: the snapshot's file names
    val out = fs.create(new Path(dir, ".graft-bak/.known-" + liveDay.getName), true)
    out.write(oldNames.mkString("\n").getBytes("UTF-8")); out.close()
    // step 2 happened: staged (deduped) content swapped in as the live day
    writeDays(table, Seq(t0))
    // crash before steps 2b/3 — recovery must finish the preservation
    table.recoverSwaps()
    val keys = table.read().select("consensusTimestamp").as[Long].collect().sorted
    assert(keys.toSeq === Seq(t0, t0 + 2), "straggler moved in, old files dropped")
    assert(!fs.exists(new Path(dir, ".graft-bak")))
  }

  private def dataFiles(dir: Path): Set[String] =
    fs.listStatus(dir).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet

  private def writeManifest(dir: String, name: String, names: Set[String]): Unit = {
    val out = fs.create(new Path(dir, ".graft-bak/" + name), true)
    out.write(names.mkString("\n").getBytes("UTF-8")); out.close()
  }

  test("post-crash append before recovery must not lose the backed-up day") {
    // The torn-state trap: crash BETWEEN live->bak and stage->live, then the
    // restarted stream appends into the day (recreating the live dir) BEFORE
    // any recovery runs. Live-dir existence now looks like a completed swap;
    // only the absent .done- marker says otherwise.
    val (table, dir) = mkTable()
    writeDays(table, Seq(t0, t0 + 1))
    val liveDay = fs.listStatus(new Path(dir))
      .map(_.getPath).filter(_.getName.startsWith("day=")).minBy(_.getName)
    val oldNames = dataFiles(liveDay)
    // a staged rewrite existed (its names matter, its content never lands)
    val (stag, stagDir) = mkTable()
    writeDays(stag, Seq(t0))
    val stagedNames = dataFiles(fs.listStatus(new Path(stagDir)).map(_.getPath)
      .filter(_.getName.startsWith("day=")).head)
    // on-disk state at the crash: manifests written, live renamed away
    fs.mkdirs(new Path(dir, ".graft-bak"))
    writeManifest(dir, ".known-" + liveDay.getName, oldNames)
    writeManifest(dir, ".staged-" + liveDay.getName, stagedNames)
    assert(fs.rename(liveDay, new Path(dir, ".graft-bak/" + liveDay.getName)))
    // restarted stream appends before recovery
    writeDays(table, Seq(t0 + 2))
    table.recoverSwaps()
    val keys = table.read().select("consensusTimestamp").as[Long].collect().sorted
    assert(keys.toSeq === Seq(t0, t0 + 1, t0 + 2),
      "old day restored AND post-crash append kept")
    assert(!fs.exists(new Path(dir, ".graft-bak")))
  }

  test("crash after swap-in but before the completion marker rolls back cleanly") {
    // Marker absent but the staged day DID land (crash in the instant
    // between rename and marker create): recovery rolls back — discards
    // exactly the staged files, restores the backup, keeps any append.
    val (table, dir) = mkTable()
    writeDays(table, Seq(t0, t0)) // old day carries a duplicate
    val liveDay = fs.listStatus(new Path(dir))
      .map(_.getPath).filter(_.getName.startsWith("day=")).minBy(_.getName)
    val oldNames = dataFiles(liveDay)
    val (stag, stagDir) = mkTable()
    writeDays(stag, Seq(t0)) // the deduped rewrite
    val stagDayDir = fs.listStatus(new Path(stagDir)).map(_.getPath)
      .filter(_.getName.startsWith("day=")).head
    val stagedNames = dataFiles(stagDayDir)
    fs.mkdirs(new Path(dir, ".graft-bak"))
    writeManifest(dir, ".known-" + liveDay.getName, oldNames)
    writeManifest(dir, ".staged-" + liveDay.getName, stagedNames)
    assert(fs.rename(liveDay, new Path(dir, ".graft-bak/" + liveDay.getName)))
    // stage->live happened (staged files now live), crash before marker
    fs.mkdirs(liveDay)
    stagedNames.foreach { n =>
      assert(fs.rename(new Path(stagDayDir, n), new Path(liveDay, n)))
    }
    writeDays(table, Seq(t0 + 2)) // post-crash append
    table.recoverSwaps()
    val keys = table.read().select("consensusTimestamp").as[Long].collect().sorted
    assert(keys.toSeq === Seq(t0, t0, t0 + 2),
      "rewrite discarded, old day (incl. its dup) restored, append kept")
    assert(!fs.exists(new Path(dir, ".graft-bak")))
  }

  test("concurrent appends and dedupe runs never lose rows") {
    val (table, _) = mkTable()
    val state = new StateStore(spark, GraftTestSpark.tmpDir("conc-state") + "/state")
    val job = new Deduplication.Job(spark, table, state,
      Deduplication.Config(catchupIntervalUs = Long.MaxValue / 4))
    writeDays(table, Seq(t0, t0)) // seed duplicate so every run has work
    val batches: Seq[Seq[Long]] = (1 to 6).map { b =>
      // a fresh day of keys plus re-appends of old keys (at-least-once
      // replays) — each batch advances the incremental window a day
      (1 to 40).map(i => t0 + b * dayNs + i) ++ Seq(t0 + 1, t0 + 2)
    }
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() =>
      try batches.foreach { ks => writeDays(table, ks); Thread.sleep(20) }
      catch { case e: Throwable => failures.add(e) })
    val deduper = new Thread(() =>
      try (1 to 4).foreach { _ => job.runIncremental(); Thread.sleep(10) }
      catch { case e: Throwable => failures.add(e) })
    appender.start(); deduper.start()
    appender.join(300000); deduper.join(300000)
    assert(failures.isEmpty, s"worker failed: ${failures.peek()}")
    // drain: one incremental for post-checkpoint data, one full for replays
    job.runIncremental()
    job.runFull()
    val expect = (Seq(t0, t0 + 1, t0 + 2) ++
      batches.flatten).distinct.sorted
    val got = table.read().select("consensusTimestamp").as[Long].collect().sorted
    assert(got.toSeq === expect, "every appended key exactly once — no loss, no dups")
  }

  test("writer lease: a stale lease from a crashed holder is taken over") {
    val dir = GraftTestSpark.tmpDir("lease-stale") + "/transactions"
    val table = new TransactionsTable(spark, dir, leaseMs = 300)
    val lease = new Path(dir, ".graft-writer-lease")
    fs.mkdirs(new Path(dir))
    val out = fs.create(lease, true)
    out.write("dead-holder".getBytes("UTF-8")); out.close()
    fs.setTimes(lease, System.currentTimeMillis() - 10000, -1)
    writeDays(table, Seq(t0)) // must take the stale lease over, not hang
    assert(table.read().count() === 1)
    assert(!fs.exists(lease), "lease released after the write")
  }

  test("writer lease: a live rival lease blocks the writer until released") {
    val dir = GraftTestSpark.tmpDir("lease-live") + "/transactions"
    val table = new TransactionsTable(spark, dir, leaseMs = 60000)
    val lease = new Path(dir, ".graft-writer-lease")
    fs.mkdirs(new Path(dir))
    val out = fs.create(lease, true)
    out.write("rival-holder".getBytes("UTF-8")); out.close()
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val th = new Thread(() =>
      try { writeDays(table, Seq(t0)); done.set(true) }
      catch { case e: Throwable => failures.add(e) })
    th.start()
    Thread.sleep(800)
    assert(!done.get(), "append must wait while a live rival holds the lease")
    fs.delete(lease, false) // rival releases
    th.join(120000)
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    assert(done.get(), "append must proceed once the lease frees")
    assert(table.read().count() === 1)
  }

  test("cross-process interleave: appends vs day swaps through separate instances") {
    // Two TransactionsTable instances = two writer "processes": each has its
    // own JVM monitor, so only the file lease serializes them. Hammer
    // appends through one against snapshot+overwriteDays cycles through the
    // other; nothing may be lost and a final quiesced dedupe must leave
    // every key exactly once.
    val dir = GraftTestSpark.tmpDir("xproc") + "/transactions"
    val a = new TransactionsTable(spark, dir, leaseMs = 1500)
    val b = new TransactionsTable(spark.newSession(), dir, leaseMs = 1500)
    writeDays(a, Seq(t0, t0)) // seed a duplicate so swaps have work
    val batches = (1 to 6).map(i => Seq(t0 + 2 * i, t0 + 2 * i + 1))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() =>
      try batches.foreach { ks => writeDays(a, ks); Thread.sleep(10) }
      catch { case e: Throwable => failures.add(e) })
    val swapper = new Thread(() =>
      try (1 to 4).foreach { _ =>
        val (df, snap) = b.readSnapshot()
        if (snap.nonEmpty)
          b.overwriteDays(df.dropDuplicates("consensusTimestamp"), Some(snap))
        Thread.sleep(10)
      } catch { case e: Throwable => failures.add(e) })
    appender.start(); swapper.start()
    appender.join(300000); swapper.join(300000)
    assert(failures.isEmpty, s"worker failed: ${failures.peek()}")
    val (df, snap) = b.readSnapshot()
    b.overwriteDays(df.dropDuplicates("consensusTimestamp"), Some(snap))
    val expect = (Seq(t0) ++ batches.flatten).distinct.sorted
    val got = a.read().select("consensusTimestamp").as[Long].collect().sorted
    assert(got.toSeq === expect,
      "every key exactly once across two writer processes — no loss, no dups")
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
