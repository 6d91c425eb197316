package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftTestSpark

/** Continuous vector curation on the persisted IVF index: intra-batch
  * collapse, standing-index drop, id-guarded replay idempotency — the
  * embedding twin of TextDedupIndexSpec's curation cases. One-hot vectors
  * make every similarity exact (cos = 1 for same axis, 0 otherwise) and
  * nProbe = nCentroids makes the probe exhaustive, so every assertion is
  * deterministic.
  */
class IvfCurationSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val dim = 64
  private val lsh = SimilaritySearch.LshConfig(dim = dim, bands = 16, bitsPerBand = 8)
  private val cfg = IvfIndex.Config(nCentroids = 4, nProbe = 4, iters = 5)

  private def oneHot(axis: Int): Array[Float] = {
    val v = new Array[Float](dim)
    v(axis % dim) = 1f
    v
  }

  private def vecs(rows: (Long, Int)*) =
    rows.map { case (id, ax) => (id, oneHot(ax)) }.toDF("vec_id", "embedding")

  private def buildBase(dir: String): Unit =
    IvfIndex.build(vecs((1L to 20L).map(i => i -> i.toInt): _*),
      "vec_id", "embedding", dir, cfg)

  test("curateBatch: intra-batch collapse, index dedup, survivors appended") {
    val dir = GraftTestSpark.tmpDir("ivf-cur")
    val out = GraftTestSpark.tmpDir("ivf-cur-out")
    buildBase(dir)
    val batch = vecs(
      101L -> 1, // duplicate of indexed vector 1 -> dropped (index match)
      102L -> 40, 103L -> 40, // intra-batch pair -> min id 102 survives
      104L -> 50) // novel -> survives
    val survivors = IvfIndex.curateBatch(batch, dir, out,
      "vec_id", "embedding", lsh, simThreshold = 0.95, nProbe = cfg.nProbe)
    assert(survivors.toSet == Set(102L, 104L))
    assert(spark.read.parquet(out).select("vec_id").as[Long].collect().toSet ==
      Set(102L, 104L))
    // Index grew by exactly the survivors.
    val indexed = spark.read.parquet(s"$dir/cells")
      .select("cand_id").as[Long].collect().toSet
    assert(indexed == (1L to 20L).toSet + 102L + 104L)
    // Searching for the dropped axis now finds the survivor.
    val hit = IvfIndex.searchIndex(vecs(999L -> 40), dir, "vec_id", "embedding",
        1, cfg.nProbe).select("cand_id").as[Long].collect()
    assert(hit.toSeq == Seq(102L))
  }

  test("a duplicate id WITHIN one batch appends once (exactly-once index)") {
    val dir = GraftTestSpark.tmpDir("ivf-cur3")
    val out = GraftTestSpark.tmpDir("ivf-cur3-out")
    buildBase(dir)
    // Same id twice in one batch (double-read feed file): equal ids form
    // no a_id < b_id pair and the vector is novel — only the entry
    // dropDuplicates guards this.
    val batch = vecs(102L -> 40, 102L -> 40, 104L -> 50)
    val survivors = IvfIndex.curateBatch(batch, dir, out, "vec_id", "embedding", lsh)
    assert(survivors.toSet == Set(102L, 104L))
    assert(survivors.length == 2, "survivor list must not repeat an id")
    val indexed = spark.read.parquet(s"$dir/cells")
      .filter(col("cand_id") === 102L).count()
    assert(indexed == 1L, "in-batch duplicate id must append exactly once")
    assert(spark.read.parquet(out).filter(col("vec_id") === 102L).count() == 1L)
  }

  test("curateBatch replay is a no-op: the inverted file is the processed-id record") {
    val dir = GraftTestSpark.tmpDir("ivf-cur2")
    val out = GraftTestSpark.tmpDir("ivf-cur2-out")
    buildBase(dir)
    val batch = vecs(102L -> 40, 103L -> 40, 104L -> 50)
    val first = IvfIndex.curateBatch(batch, dir, out, "vec_id", "embedding", lsh)
    assert(first.toSet == Set(102L, 104L))
    val cellRows = spark.read.parquet(s"$dir/cells").count()
    val outRows = spark.read.parquet(out).count()
    // Full replay (same ids): the id guard drops everything before any
    // sketch work; output and index are byte-stable.
    val again = IvfIndex.curateBatch(batch, dir, out, "vec_id", "embedding", lsh)
    assert(again.isEmpty)
    assert(spark.read.parquet(s"$dir/cells").count() == cellRows)
    assert(spark.read.parquet(out).count() == outRows)
    // Partial replay: an already-curated near-dup under a NEW id is dropped
    // by the standing-index match (not the id guard).
    val near = IvfIndex.curateBatch(vecs(202L -> 40), dir, out, "vec_id", "embedding", lsh)
    assert(near.isEmpty)
  }

  test("two concurrent curators serialize on the writer lease (no double-keep)") {
    val dir = GraftTestSpark.tmpDir("ivf-hammer")
    val outA = GraftTestSpark.tmpDir("ivf-cur-a")
    val outB = GraftTestSpark.tmpDir("ivf-cur-b")
    buildBase(dir)
    // Two "sessions" race curateBatch with IDENTICAL novel vectors under
    // different ids (axes 40-45, none indexed): whichever batch appends
    // first must make the other's vectors all match the standing index
    // (cos = 1.0) and drop. Interleaving — both probing the index before
    // either appends — would keep both copies; the lease makes the whole
    // read-decide-append cycle atomic per curator (the adversarial twin of
    // TextDedupIndexSpec's case, on the vector path).
    val axes = 40 until 46
    val batchA = vecs(axes.map(ax => (9100000L + ax, ax)): _*)
    val batchB = vecs(axes.map(ax => (9200000L + ax, ax)): _*)
    @volatile var keptA: Set[Long] = null
    @volatile var keptB: Set[Long] = null
    @volatile var err: Throwable = null
    def curator(batch: org.apache.spark.sql.DataFrame, out: String,
        sink: Set[Long] => Unit) = new Thread(() =>
      try sink(IvfIndex.curateBatch(batch, dir, out,
        "vec_id", "embedding", lsh, 0.95, cfg.nProbe).toSet)
      catch { case t: Throwable => err = t })
    val ta = curator(batchA, outA, keptA = _)
    val tb = curator(batchB, outB, keptB = _)
    ta.start(); tb.start(); ta.join(600000); tb.join(600000)
    assert(err == null, s"curator failed: $err")
    assert(keptA != null && keptB != null, "a curator timed out")
    assert(keptA.size + keptB.size === axes.size,
      s"exactly one copy of each vector must survive across the two curators " +
        s"(A kept ${keptA.size}, B kept ${keptB.size})")
    // Exactly-once index state after the race: per contested axis, exactly
    // ONE of the two rival ids is in the inverted file, and the total grew
    // by exactly the survivor count (serialized appends, no partial batch).
    val indexed = spark.read.parquet(s"$dir/cells")
      .select("cand_id").as[Long].collect().toSet
    axes.foreach { ax =>
      val rivals = Set(9100000L + ax, 9200000L + ax) & indexed
      assert(rivals.size === 1, s"axis $ax indexed under $rivals")
    }
    assert(indexed.size === 20 + axes.size)
    assert(indexed == (1L to 20L).toSet ++ (keptA ++ keptB))
    // The search surface agrees: probing a contested axis returns the one
    // surviving id with an exact-match score.
    val hit = IvfIndex.searchIndex(vecs(999L -> 40), dir, "vec_id", "embedding",
        1, cfg.nProbe).select("cand_id").as[Long].collect().toSeq
    assert(hit.size == 1 && (keptA ++ keptB).contains(hit.head))
    assert(!new java.io.File(s"$dir/.graft-writer-lease").exists(),
      "lease must be released")
  }

  test("curateStream: survivors across batches, exactly-once index under forced replay") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = GraftTestSpark.tmpDir("ivf-cs")
    val feed = GraftTestSpark.tmpDir("ivf-cs-feed")
    val out = GraftTestSpark.tmpDir("ivf-cs-out")
    val ckpt = GraftTestSpark.tmpDir("ivf-cs-ckpt")
    buildBase(dir)

    def runOnce(): Unit = {
      val input = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .parquet(s"$feed/*")
      val q = IvfIndex.curateStream(input, dir, out, ckpt,
        "vec_id", "embedding", lsh, 0.95, Trigger.AvailableNow())
      q.awaitTermination()
    }

    vecs(101L -> 1, 102L -> 40, 103L -> 40).write.parquet(s"$feed/b1")
    runOnce()
    // batch 2: near-dup of a batch-1 survivor + a novel vector
    vecs(201L -> 40, 202L -> 50).write.parquet(s"$feed/b2")
    runOnce()
    val curated = spark.read.parquet(out).select("vec_id").as[Long].collect().toSet
    assert(curated == Set(102L, 202L),
      "one representative per near-dup cluster across batches")

    // Force a foreachBatch redelivery (crash-after-foreachBatch window):
    // delete the newest commit so the restarted query re-runs that batch.
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val cellRows = spark.read.parquet(s"$dir/cells").count()
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    assert(commits.last.delete())
    runOnce()
    assert(spark.read.parquet(out).select("vec_id").as[Long].collect().toSet == curated,
      "id guard must make the replayed batch a no-op for the output")
    assert(spark.read.parquet(s"$dir/cells").count() == cellRows,
      "id guard must make the replayed batch a no-op for the index")
  }
}
