package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The incremental ledger's one invariant: after ANY batched ingestion of
  * an edge set, [[IncrementalClusters.labels]] equals the one-shot
  * [[ConnectedComponents]] fixpoint over the union of all edges (canonical
  * min-id labels, singletons included) — plus the compaction, replay, and
  * remap-chain corners. */
class IncrementalClustersSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    GraftTestSpark.tmpDir("incc-spec")

  private def ledgerLabels(dir: String): Map[Long, Long] =
    IncrementalClusters.labels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def oneShot(edges: Seq[(Long, Long)], verts: Seq[Long]): Map[Long, Long] = {
    val comp =
      if (edges.isEmpty) Map.empty[Long, Long]
      else ConnectedComponents.components(
          edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    verts.map(v => v -> comp.getOrElse(v, v)).toMap
  }

  test("batched ingestion equals the one-shot fixpoint (random graph, 4 batches)") {
    val rnd = new scala.util.Random(11)
    val n = 120L
    val verts = (1L to n)
    val edges = Seq.fill(90)((rnd.nextLong(n) + 1, rnd.nextLong(n) + 1))
    val dir = freshDir()
    // batch i owns ids with id % 4 == i and every edge whose LATER parity
    // batch it is (both endpoints already ingested or arriving now)
    val batchOf = (v: Long) => (v % 4).toInt
    (0 to 3).foreach { i =>
      val vs = verts.filter(batchOf(_) == i)
      val es = edges.filter { case (a, b) => math.max(batchOf(a), batchOf(b)) == i }
      IncrementalClusters.addBatch(spark, dir,
        vs.toDF("id"), "id",
        (if (es.isEmpty) Seq((-1L, -1L)).take(0) else es).toDF("a", "b"), "a", "b")
    }
    assert(ledgerLabels(dir) === oneShot(edges, verts))
  }

  test("cross-batch merges resolve through remap chains") {
    val dir = freshDir()
    IncrementalClusters.addBatch(spark, dir,
      Seq(10L, 11L).toDF("id"), "id", Seq((10L, 11L)).toDF("a", "b"), "a", "b")
    assert(ledgerLabels(dir) === Map(10L -> 10L, 11L -> 10L))
    IncrementalClusters.addBatch(spark, dir,
      Seq(5L).toDF("id"), "id", Seq((5L, 10L)).toDF("a", "b"), "a", "b")
    assert(ledgerLabels(dir) === Map(5L -> 5L, 10L -> 5L, 11L -> 5L))
    // third batch supersedes the superseder — a 10 -> 5 -> 1 chain
    IncrementalClusters.addBatch(spark, dir,
      Seq(1L).toDF("id"), "id", Seq((1L, 11L)).toDF("a", "b"), "a", "b")
    assert(ledgerLabels(dir) ===
      Map(1L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("compaction folds remap into labels and preserves the view") {
    val dir = freshDir()
    IncrementalClusters.addBatch(spark, dir,
      Seq(10L, 11L).toDF("id"), "id", Seq((10L, 11L)).toDF("a", "b"), "a", "b")
    IncrementalClusters.addBatch(spark, dir,
      Seq(5L, 7L).toDF("id"), "id", Seq((5L, 10L)).toDF("a", "b"), "a", "b")
    val before = ledgerLabels(dir)
    IncrementalClusters.compact(spark, dir)
    assert(ledgerLabels(dir) === before)
    // remap history folded away
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(spark.read.parquet(
      graft.util.SwapDir.readPath(f, new Path(dir, "remap")).toString).count() === 0L)
    // the ledger keeps working after compaction
    IncrementalClusters.addBatch(spark, dir,
      Seq(2L).toDF("id"), "id", Seq((2L, 7L)).toDF("a", "b"), "a", "b")
    assert(ledgerLabels(dir) ===
      Map(2L -> 2L, 5L -> 5L, 7L -> 2L, 10L -> 5L, 11L -> 5L))
  }

  test("replaying a batch is a no-op") {
    val dir = freshDir()
    val vs = Seq(1L, 2L, 3L).toDF("id")
    val es = Seq((1L, 2L)).toDF("a", "b")
    IncrementalClusters.addBatch(spark, dir, vs, "id", es, "a", "b")
    val first = ledgerLabels(dir)
    IncrementalClusters.addBatch(spark, dir, vs, "id", es, "a", "b")
    assert(ledgerLabels(dir) === first)
    assert(IncrementalClusters.labels(spark, dir).count() === 3L)
  }

  test("ingestAndLabel: batched LSH ingest reproduces the one-shot clusters") {
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "spark engine shuffles partitions across the cluster with broadcast " +
      "joins and adaptive query execution for large scale data pipelines"
    val mutated = base.replace("quick", "speedy").replace("lazy", "sleepy")
    val rnd = new scala.util.Random(7)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "metric", "vector",
      "stream", "batch", "table", "join", "filter", "window", "hash")
    val unrelated = (4L to 30L).map(i =>
      (i, Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(s"doc$i ", " ", "")))
    // near-dups 1~2~3 split ACROSS batches so the cross-batch searchNew
    // path (not just intra-batch pairs) carries the merge
    val all = Seq((1L, base), (2L, mutated), (3L, base.toUpperCase)) ++ unrelated
    val batches = Seq(
      all.filter(_._1 % 3 == 1), all.filter(_._1 % 3 == 2), all.filter(_._1 % 3 == 0))
    val indexDir = freshDir() + "/idx"
    val ledgerDir = freshDir() + "/led"
    TextDedupIndex.build(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    batches.foreach { b =>
      TextDedupIndex.ingestAndLabel(b.toDF("doc_id", "text"),
        indexDir, ledgerDir, "doc_id", "text")
    }
    val oneShotPairs = TextDedup.nearDuplicatePairs(
        all.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = oneShot(oneShotPairs, all.map(_._1))
    assert(ledgerLabels(ledgerDir) === expected)
    // non-vacuous: the planted trio actually clustered
    assert(expected(1L) === 1L && expected(2L) === 1L && expected(3L) === 1L)
  }

  test("labelStream: streamed batches reproduce the one-shot clusters; a forced replay is a no-op") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "spark engine shuffles partitions across the cluster with broadcast " +
      "joins and adaptive query execution for large scale data pipelines"
    val rnd = new scala.util.Random(13)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "metric", "vector",
      "stream", "batch", "table", "join", "filter", "window", "hash")
    val unrelated = (4L to 24L).map(i =>
      (i, Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(s"doc$i ", " ", "")))
    val all = Seq((1L, base), (2L, base.replace("quick", "speedy")),
      (3L, base.toUpperCase)) ++ unrelated
    val indexDir = freshDir() + "/idx"
    val ledgerDir = freshDir() + "/led"
    val feed = freshDir() + "/feed"
    val ckpt = freshDir() + "/ckpt"
    TextDedupIndex.build(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", indexDir)
    def runOnce(): Unit = {
      val input = spark.readStream.schema("doc_id LONG, text STRING")
        .parquet(s"$feed/*")
      TextDedupIndex.labelStream(input, indexDir, ledgerDir, ckpt,
        "doc_id", "text", trigger = Trigger.AvailableNow()).awaitTermination()
    }
    // the near-dup trio splits across the two deliveries, so the merge
    // rides the cross-batch searchNew path
    all.filter(_._1 % 2 == 1).toDF("doc_id", "text").write.parquet(s"$feed/b1")
    runOnce()
    all.filter(_._1 % 2 == 0).toDF("doc_id", "text").write.parquet(s"$feed/b2")
    runOnce()
    val oneShotPairs = TextDedup.nearDuplicatePairs(
        all.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = oneShot(oneShotPairs, all.map(_._1))
    assert(ledgerLabels(ledgerDir) === expected)
    assert(expected(2L) === 1L && expected(3L) === 1L, "planted trio must cluster")
    // Crash-after-foreachBatch window: deleting the newest commit-log entry
    // re-delivers that batch on restart. labelStream claims replay
    // idempotence WITHOUT a marker ledger — the labels must not move.
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    assert(commits.last.delete())
    runOnce()
    assert(ledgerLabels(ledgerDir) === expected,
      "a replayed micro-batch must leave the ledger byte-identical")
  }

  test("edge endpoints unknown to both the batch and the ledger are adopted") {
    val dir = freshDir()
    IncrementalClusters.addBatch(spark, dir,
      Seq(4L).toDF("id"), "id", Seq((4L, 9L)).toDF("a", "b"), "a", "b")
    assert(ledgerLabels(dir) === Map(4L -> 4L, 9L -> 4L))
  }
}
