package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{GraftTestSpark, Tables}

/** The sharded-corpus sink: deterministic placement + order, one file per
  * shard, manifest/files consistency, atomic republish.
  */
class ShardWriterSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sfDir = GraftTestSpark.sfDir
  private val nShards = 8

  private def docs = Tables.load(spark, sfDir, "documents")

  test("write: complete, consistent, one file per shard, deterministic order") {
    val dir = GraftTestSpark.tmpDir("shardw")
    val m = ShardWriter.write(docs, "doc_id", dir, nShards)
    assert(m.nShards == nShards)
    assert(m.totalRows == docs.count())
    assert(m.shardRows.values.sum == m.totalRows)
    assert(ShardWriter.verify(spark, dir))

    // Exactly one data file per shard dir.
    val shardsRoot = new java.io.File(dir, "shards")
    val shardDirs = shardsRoot.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == m.shardRows.size)
    shardDirs.foreach { d =>
      val dataFiles = d.listFiles().filter(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      assert(dataFiles.length == 1, s"${d.getName}: ${dataFiles.length} files")
    }

    // Round trip: every doc exactly once.
    val back = ShardWriter.readAll(spark, dir)
    assert(back.count() == m.totalRows)
    assert(back.select("doc_id").distinct().count() == m.totalRows)

    // In-shard order is the salted-hash order (file row order = sort order).
    import graft.functions.TextFunctions.portableHash60
    val s0 = ShardWriter.readShard(spark, dir, 0)
      .withColumn("h", portableHash60(concat(lit("shard:"), col("doc_id").cast("string"))))
      .select("doc_id", "h").collect()
    assert(s0.nonEmpty)
    val hs = s0.map(_.getLong(1)).toSeq
    assert(hs == hs.sorted, "shard 0 rows not in hash order")

    // Rewrite (same input): identical shard sequences.
    val before = s0.map(_.getLong(0)).toSeq
    ShardWriter.write(docs, "doc_id", dir, nShards)
    val after = ShardWriter.readShard(spark, dir, 0).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(before == after)
  }

  test("manifest counts come from footers: the staged data is never re-read") {
    // Capture every query executed during write() and assert none of them
    // SCANS the staging dir — the manifest's per-shard counts must come
    // from the staged files' parquet FOOTER metadata (retry-exact, no data
    // pages), not an O(corpus) re-read of what was just written.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, duration: Long): Unit =
        plans.add(qe.executedPlan.toString): Unit
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val dir = GraftTestSpark.tmpDir("shardobs")
    try {
      val m = ShardWriter.write(docs, "doc_id", dir, nShards)
      assert(ShardWriter.verify(spark, dir), "observed counts must match the files")
      assert(m.totalRows == docs.count())
      // listener bus is async — wait (bounded) until the captured set
      // stabilizes: no new plan for 1 s, or 15 s total
      val deadline = System.currentTimeMillis() + 15000
      var last = -1
      var stableSince = System.currentTimeMillis()
      while (System.currentTimeMillis() < deadline &&
          (plans.size() != last || System.currentTimeMillis() - stableSince < 1000)) {
        if (plans.size() != last) { last = plans.size(); stableSince = System.currentTimeMillis() }
        Thread.sleep(50)
      }
      // A scan of the staging dir would surface as a FileScan whose
      // Location includes shards.tmp; the write job's own plan mentions
      // shards.tmp only in its InsertIntoHadoopFsRelationCommand line.
      val offenders = plans.toArray(Array.empty[String])
        .filter(_.linesIterator.exists(l =>
          l.contains("FileScan") && l.contains("shards.tmp")))
      assert(offenders.isEmpty,
        s"write() re-read its own staging dir:\n${offenders.headOption.getOrElse("")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("an empty corpus publishes as a valid empty shard set") {
    val dir = GraftTestSpark.tmpDir("shardempty")
    val m = ShardWriter.write(docs.filter(col("doc_id") < 0), "doc_id", dir, 4)
    assert(m.totalRows == 0L && m.shardRows.isEmpty)
    assert(ShardWriter.readAll(spark, dir).count() == 0L)
    assert(ShardWriter.readManifest(spark, dir) == m)
    assert(ShardWriter.verify(spark, dir))
  }

  test("a salt needing JSON escaping is rejected up front") {
    val dir = GraftTestSpark.tmpDir("shardsalt")
    intercept[IllegalArgumentException](
      ShardWriter.write(docs, "doc_id", dir, 4, salt = "v\"2"))
  }

  test("manifest round-trips through its JSON") {
    val dir = GraftTestSpark.tmpDir("shardm")
    val written = ShardWriter.write(docs.limit(50), "doc_id", dir, 4, salt = "v2")
    val read = ShardWriter.readManifest(spark, dir)
    assert(read == written)
  }

  test("two concurrent writers serialize on the lease: the final state is one complete version") {
    val dir = GraftTestSpark.tmpDir("shardrace")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(n: Int): Thread = new Thread(() =>
      try (1 to 3).foreach { _ => ShardWriter.write(docs.limit(40 * n), "doc_id", dir, 4) }
      catch { case t: Throwable => errors.add(t) })
    val (a, b) = (writer(1), writer(2))
    a.start(); b.start(); a.join(120000); b.join(120000)
    assert(errors.isEmpty, s"concurrent writers must queue, not fail: ${errors.peek()}")
    // Whichever write landed last, the published state is self-consistent:
    // manifest matches files, and the row count is one of the two versions.
    assert(ShardWriter.verify(spark, dir))
    val rows = ShardWriter.readAll(spark, dir).count()
    assert(rows == 40L || rows == 80L)
    assert(!new java.io.File(dir, "shards.tmp").exists(),
      "no orphaned staging after both writers finish")
  }

  test("a republish is atomic: readers resolve a complete version mid-swap") {
    val dir = GraftTestSpark.tmpDir("shardswap")
    ShardWriter.write(docs.limit(100), "doc_id", dir, 4)
    val v1 = ShardWriter.readAll(spark, dir).count()
    // Simulate the crash window: live renamed away, backup present
    // (SwapDir state between its two renames).
    val root = new java.io.File(dir)
    val live = new java.io.File(root, "shards")
    val bak = new java.io.File(root, "shards.bak")
    assert(live.renameTo(bak))
    assert(ShardWriter.readAll(spark, dir).count() == v1,
      "reader must fall back to the backup during the swap window")
    // The next leased writer repairs and republishes.
    val m2 = ShardWriter.write(docs.limit(80), "doc_id", dir, 4)
    assert(m2.totalRows == 80)
    assert(ShardWriter.verify(spark, dir))
    assert(!bak.exists(), "backup must be cleaned after the next write")
  }
}
