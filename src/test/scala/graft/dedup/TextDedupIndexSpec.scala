package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** Persisted MinHash-LSH index lifecycle: build → searchNew → appendDocs.
  * The search path must agree with the transient
  * [[TextDedup.nearDuplicatePairs]] cross-pairs (same family, same caps) —
  * the index is a LAYOUT of the same math, never a different answer.
  */
class TextDedupIndexSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val cfg = TextDedup.MinHashConfig(jaccardThreshold = 0.4)
  private lazy val corpus = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    .select(col("doc_id"), col("text")).cache()

  // deterministic selection: the same 5 lowest-id docs on every call
  private def planted(offset: Long) = corpus.orderBy(col("doc_id")).limit(5)
    .withColumn("doc_id", col("doc_id") + offset)
    .withColumn("text", concat(col("text"), lit(" extra token")))

  test("build + searchNew finds planted near-dups against the standing corpus") {
    val dir = GraftTestSpark.tmpDir("lsh-index")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val pairs = TextDedupIndex.searchNew(planted(1000000L), dir, "doc_id", "text", cfg)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (_, _, _, j) => assert(j >= cfg.jaccardThreshold) }
    // every planted doc must find its source (a " extra token" suffix keeps
    // jaccard far above threshold)
    val found = pairs.map(p => (p._1, p._2)).toSet
    (0 until 5).foreach { i =>
      val srcId = corpus.orderBy(col("doc_id")).limit(5).collect()(i).getLong(0)
      assert(found.contains((srcId + 1000000L, srcId)),
        s"planted copy of doc $srcId not matched to its source")
    }
  }

  test("index search equals the transient cross-pair set") {
    val dir = GraftTestSpark.tmpDir("lsh-index")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val newDocs = planted(1000000L)
    val viaIndex = TextDedupIndex.searchNew(newDocs, dir, "doc_id", "text", cfg)
      .select(col("corpus_id"), col("new_id")).as[(Long, Long)].collect().toSet
    // transient path over the union, restricted to corpus×new pairs
    // (a_id < b_id and new ids are offset high, so cross pairs are (corpus, new))
    val transient = TextDedup.nearDuplicatePairs(
        corpus.unionByName(newDocs), "doc_id", "text", cfg)
      .filter(col("a_id") < 1000000L && col("b_id") >= 1000000L)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(transient.nonEmpty)
    assert(viaIndex === transient,
      "persisted-index search must reproduce the transient pipeline's cross pairs")
  }

  test("appendDocs extends the index: a later batch matches appended docs") {
    val dir = GraftTestSpark.tmpDir("lsh-index")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    TextDedupIndex.appendDocs(planted(1000000L), dir, "doc_id", "text", cfg)
    // third batch: near-dups OF THE APPENDED DOCS (same text mutation, so
    // they also match the original corpus — assert the appended ids appear)
    val pairs = TextDedupIndex.searchNew(planted(2000000L), dir, "doc_id", "text", cfg)
      .select(col("new_id"), col("corpus_id")).as[(Long, Long)].collect()
    val matchedAppended = pairs.collect {
      case (n, c) if c >= 1000000L && c < 2000000L => (n, c)
    }
    assert(matchedAppended.nonEmpty,
      "appended docs must be searchable as part of the standing corpus")
    // identical text (planted(1M) vs planted(2M) differ only in id) pairs at
    // jaccard 1.0 — every third-batch doc must hit its appended twin
    assert(matchedAppended.map(_._1).distinct.length === 5)
  }

  test("a skewed arriving batch is census-capped like the transient union pipeline") {
    // 70 near-identical copies of one corpus doc: every band bucket they
    // form holds ~70 rows > maxBucket=64, so BOTH paths must drop those
    // buckets (no join blowup, no pairs); 3 well-behaved planted docs in
    // the same batch must still match. The combined census (stored counts +
    // the batch's own band counts) is what makes the index path agree.
    val (id0, text0) = corpus.orderBy(col("doc_id")).limit(1)
      .as[(Long, String)].collect().head
    val flood = (0 until 70)
      .map(i => (id0 + 3000000L + i * 10, text0 + " extra token"))
      .toDF("doc_id", "text")
    val newDocs = flood.unionByName(planted(4000000L).limit(3))
    val dir = GraftTestSpark.tmpDir("lsh-index")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val viaIndex = TextDedupIndex.searchNew(newDocs, dir, "doc_id", "text", cfg)
      .select(col("corpus_id"), col("new_id")).as[(Long, Long)].collect().toSet
    val transient = TextDedup.nearDuplicatePairs(
        corpus.unionByName(newDocs), "doc_id", "text", cfg)
      .filter(col("a_id") < 3000000L && col("b_id") >= 3000000L)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(viaIndex === transient,
      "combined-census cap must reproduce the transient union census under batch skew")
    assert(viaIndex.exists(_._2 >= 4000000L),
      "well-behaved docs in a skewed batch must still match")
    assert(!viaIndex.exists(p => p._2 >= 3000000L && p._2 < 4000000L),
      "the flooded bucket must be dropped, not joined")
  }

  test("searchNew plan: no cartesian product, sets read prunes the sig column") {
    val dir = GraftTestSpark.tmpDir("lsh-index")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val plan = TextDedupIndex.searchNew(planted(1000000L), dir, "doc_id", "text", cfg)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no quadratic stage in the search plan")
    // the sets table stores (doc_id, sh, sig); the probe needs doc_id+sh
    // only — parquet column pruning must drop the 64-long sig payload
    val setsScans = plan.linesIterator.filter(l =>
      l.contains("/sets") && l.contains("ReadSchema")).toSeq
    assert(setsScans.nonEmpty, "expected a FileScan over the sets table")
    setsScans.foreach(l => assert(!l.contains("sig"),
      s"sets scan must not read the signature column: $l"))
  }

  // deterministic novel docs, mutually dissimilar and dissimilar to the
  // corpus (distinct synthetic token streams)
  private def novel(id: Long, salt: String): (Long, String) =
    id -> (0 until 60).map(j => s"$salt$j").mkString(" ")

  test("curateBatch: intra-batch collapse, index dedup, survivors appended") {
    val dir = GraftTestSpark.tmpDir("lsh-index")
    val out = GraftTestSpark.tmpDir("curate-out")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val (_, t0) = corpus.orderBy(col("doc_id")).limit(1)
      .as[(Long, String)].collect().head
    val a = novel(5000001L, "aa")
    val aPrime = (5000002L, a._2 + " extra token") // near-dup of a, higher id
    val b = novel(5000003L, "bb")
    val batch = Seq((5000000L, t0 + " extra token"), a, aPrime, b)
      .toDF("doc_id", "text")
    val kept = TextDedupIndex.curateBatch(batch, dir, out, "doc_id", "text", cfg).toSet
    assert(kept === Set(a._1, b._1),
      "corpus-dup dropped, intra-batch pair collapsed to min id, novel kept")
    // a second batch near-duplicating a survivor must now be dropped too
    val batch2 = Seq((6000001L, a._2 + " another token"), novel(6000002L, "cc"))
      .toDF("doc_id", "text")
    val kept2 = TextDedupIndex.curateBatch(batch2, dir, out, "doc_id", "text", cfg).toSet
    assert(kept2 === Set(6000002L),
      "survivors of earlier batches are part of the standing corpus")
    // the curated output holds exactly the survivors, and staging is clean
    val curated = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(curated === Set(a._1, b._1, 6000002L))
    val staging = new java.io.File(s"$dir/staging")
    assert(!staging.exists() || staging.listFiles().isEmpty,
      "curateBatch must clean up its staging dir")
  }

  test("an already-indexed doc reports itself as a match (replay/re-crawl safety)") {
    val dir = GraftTestSpark.tmpDir("lsh-index")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val again = corpus.orderBy(col("doc_id")).limit(3)
    val pairs = TextDedupIndex.searchNew(again, dir, "doc_id", "text", cfg)
      .as[(Long, Long, Long, Double)].collect()
    val selfMatches = pairs.collect { case (n, c, _, j) if n == c => (n, j) }
    assert(selfMatches.length === 3, "identical indexed content must self-match")
    selfMatches.foreach { case (_, j) => assert(j === 1.0) }
  }

  test("shingle-less docs dedupe exactly by fingerprint across batches") {
    val dir = GraftTestSpark.tmpDir("lsh-index")
    val out = GraftTestSpark.tmpDir("curate-out")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    // two tokens < shingleK=3: no shingle evidence, MinHash cannot see
    // them; null text coalesces to "" and takes the same exact path
    val batch1 = Seq((7000001L, "tiny stub"), (7000002L, "tiny stub"),
      (7000003L, "other stub"), (7000004L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val kept1 = TextDedupIndex.curateBatch(batch1, dir, out, "doc_id", "text", cfg).toSet
    assert(kept1 === Set(7000001L, 7000003L, 7000004L),
      "intra-batch exact dups of short docs collapse to min id; null text kept once")
    // the same stub (and another null-text doc) arriving again must be
    // dropped by the shortfp table
    val batch2 = Seq((8000001L, "tiny stub"), (8000002L, "brand new stub"),
      (8000003L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val kept2 = TextDedupIndex.curateBatch(batch2, dir, out, "doc_id", "text", cfg).toSet
    assert(kept2 === Set(8000002L),
      "indexed short docs (incl. the null-text representative) must not re-emit")
  }

  test("curateStream: curated output across batches with checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = GraftTestSpark.tmpDir("lsh-index")
    val feed = GraftTestSpark.tmpDir("curate-feed")
    val out = GraftTestSpark.tmpDir("curate-out")
    val ckpt = GraftTestSpark.tmpDir("curate-ckpt")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val (_, t0) = corpus.orderBy(col("doc_id")).limit(1)
      .as[(Long, String)].collect().head
    val a = novel(5000001L, "aa")

    def runOnce(): Unit = {
      val input = spark.readStream.schema("doc_id LONG, text STRING")
        .parquet(s"$feed/*")
      val q = TextDedupIndex.curateStream(input, dir, out, ckpt,
        "doc_id", "text", cfg, Trigger.AvailableNow())
      q.awaitTermination()
    }

    Seq((5000000L, t0 + " extra token"), a, (5000002L, a._2 + " extra token"))
      .toDF("doc_id", "text").write.parquet(s"$feed/b1")
    runOnce()
    // batch 2: near-dup of a survivor + a novel doc
    Seq((6000001L, a._2 + " another token"), novel(6000002L, "cc"))
      .toDF("doc_id", "text").write.parquet(s"$feed/b2")
    runOnce()

    val curated = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(curated === Set(5000001L, 6000002L),
      "curated output keeps one representative per cluster across batches")

    // FORCE a foreachBatch replay — deleting the newest entry from Spark's
    // commit log makes the restarted query re-deliver that batch (this is
    // the crash-after-foreachBatch window, which Spark's own checkpoint
    // cannot dedupe; only the curate ledger can)
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val setsRows = spark.read.parquet(s"$dir/sets").count()
    // drop the checksum sibling too — a stale .crc trips Spark's
    // concurrent-query detection on the rewrite
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    assert(commits.last.delete())
    runOnce()
    val again = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(again === curated,
      "ledger idx-mark must make the replayed batch a no-op for the output")
    assert(spark.read.parquet(s"$dir/sets").count() === setsRows,
      "ledger idx-mark must make the replayed batch a no-op for the index")
  }

  private def dataFiles(path: String): Int = {
    val d = new java.io.File(path)
    if (!d.exists()) 0
    else d.listFiles().count(f => f.isFile
      && !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  test("continuous appends keep the index file count bounded (auto-compaction)") {
    val dir = GraftTestSpark.tmpDir("lsh-compact")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val before = TextDedupIndex.searchNew(planted(1000000L), dir, "doc_id", "text", cfg)
      .select(col("new_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    // 12 appends of 8 novel docs each: every append writes up to
    // defaultParallelism band files, so without compaction bands/ would hold
    // ~48 files — past the 8×parallelism=32 threshold
    (0 until 12).foreach { i =>
      val batch = (0 until 8).map(j => novel(9000000L + i * 100 + j, s"zz${i}x$j"))
        .toDF("doc_id", "text")
      TextDedupIndex.appendDocs(batch, dir, "doc_id", "text", cfg)
    }
    val bound = 8 * spark.sparkContext.defaultParallelism
    assert(dataFiles(s"$dir/bands") <= bound,
      s"bands/ holds ${dataFiles(s"$dir/bands")} files, threshold $bound")
    assert(dataFiles(s"$dir/sets") <= bound,
      s"sets/ holds ${dataFiles(s"$dir/sets")} files, threshold $bound")
    assert(dataFiles(s"$dir/counts") <= bound,
      s"counts/ holds ${dataFiles(s"$dir/counts")} files, threshold $bound")
    // census-delta invariant: the summed deltas equal a fresh aggregation
    // of the bands table, bucket for bucket — append order, partial
    // compactions, and the build's initial census must all compose
    locally {
      val summed = spark.read.parquet(s"$dir/counts")
        .groupBy(col("band_key")).agg(sum(col("n")).as("n"))
        .as[(Long, Long)].collect().toMap
      val fresh = spark.read.parquet(s"$dir/bands")
        .groupBy(col("band_key")).agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(summed === fresh, "summed census deltas diverged from the bands table")
    }
    // compaction is a re-layout, never a different answer: the appended
    // docs are novel (no cross-matches), so the planted probes must find
    // exactly the pre-append pair set
    val after = TextDedupIndex.searchNew(planted(1000000L), dir, "doc_id", "text", cfg)
      .select(col("new_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(after === before, "search results must be unchanged by compaction")
    // and the explicit entry point compacts below any requested bound
    TextDedupIndex.compact(spark, dir, maxFiles = spark.sparkContext.defaultParallelism)
    assert(dataFiles(s"$dir/bands") <= spark.sparkContext.defaultParallelism)
    val again = TextDedupIndex.searchNew(planted(1000000L), dir, "doc_id", "text", cfg)
      .select(col("new_id"), col("corpus_id")).as[(Long, Long)].collect().toSet
    assert(again === before)
  }

  test("appendDocs does not re-append already-indexed short fingerprints") {
    val dir = GraftTestSpark.tmpDir("lsh-shortfp")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    TextDedupIndex.appendDocs(
      Seq((9400001L, "tiny stub2"), (9400002L, "uniq stub3")).toDF("doc_id", "text"),
      dir, "doc_id", "text", cfg)
    val n1 = spark.read.parquet(s"$dir/shortfp").count()
    // the same short text arriving again under a new id (direct appendDocs,
    // no curateBatch pre-drop) must not grow the fingerprint table
    TextDedupIndex.appendDocs(
      Seq((9400003L, "tiny stub2")).toDF("doc_id", "text"),
      dir, "doc_id", "text", cfg)
    val n2 = spark.read.parquet(s"$dir/shortfp").count()
    assert(n2 === n1, "duplicate short-doc fingerprints must be anti-joined away")
    assert(spark.read.parquet(s"$dir/shortfp").distinct().count() === n2)
  }

  test("two concurrent curators serialize on the writer lease (no double-keep)") {
    val dir = GraftTestSpark.tmpDir("lsh-hammer")
    val outA = GraftTestSpark.tmpDir("curate-a")
    val outB = GraftTestSpark.tmpDir("curate-b")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    // two "sessions" race curateBatch with IDENTICAL novel texts under
    // different ids: whichever batch appends first must make the other's
    // docs all match (jaccard 1.0) and drop. Interleaving (both staging
    // their survivors before either appends) would keep both copies — the
    // lease makes the whole read-decide-append cycle atomic per curator.
    val texts = (0 until 6).map(i => novel(0L, s"hh$i")._2)
    val batchA = texts.zipWithIndex.map { case (t, i) => (9100000L + i, t) }
      .toDF("doc_id", "text")
    val batchB = texts.zipWithIndex.map { case (t, i) => (9200000L + i, t) }
      .toDF("doc_id", "text")
    @volatile var keptA: Set[Long] = null
    @volatile var keptB: Set[Long] = null
    @volatile var err: Throwable = null
    def curator(batch: org.apache.spark.sql.DataFrame, out: String,
        sink: Set[Long] => Unit) = new Thread(() =>
      try sink(TextDedupIndex.curateBatch(batch, dir, out, "doc_id", "text", cfg).toSet)
      catch { case t: Throwable => err = t })
    val ta = curator(batchA, outA, keptA = _)
    val tb = curator(batchB, outB, keptB = _)
    ta.start(); tb.start(); ta.join(600000); tb.join(600000)
    assert(err == null, s"curator failed: $err")
    assert(keptA != null && keptB != null, "a curator timed out")
    assert(keptA.size + keptB.size === 6,
      s"exactly one copy of each text must survive across the two curators " +
        s"(A kept ${keptA.size}, B kept ${keptB.size})")
    // the index is consistent after the race: the stored census matches a
    // recount of the bands table, and no text is indexed under both ids
    val counts = spark.read.parquet(s"$dir/counts")
      .as[(Long, Long)].collect().toMap
    val recounted = spark.read.parquet(s"$dir/bands")
      .groupBy(col("band_key")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts === recounted, "census must match the bands table after the race")
    assert(!new java.io.File(leaseFile(dir)).exists(), "lease must be released")
  }

  private def leaseFile(dir: String) = s"$dir/.graft-writer-lease"

  test("stream start sweeps orphaned staging dirs; the ledger stays bounded") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = GraftTestSpark.tmpDir("lsh-sweep")
    val feed = GraftTestSpark.tmpDir("sweep-feed")
    val out = GraftTestSpark.tmpDir("sweep-out")
    val ckpt = GraftTestSpark.tmpDir("sweep-ckpt")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    // a staging dir orphaned by a crashed attempt that never out-marked
    val orphan = new java.io.File(s"$dir/staging/orphan-attempt")
    assert(orphan.mkdirs())
    java.nio.file.Files.write(orphan.toPath.resolve("junk.parquet"),
      "x".getBytes("UTF-8"))
    def runOnce(): Unit = {
      val input = spark.readStream.schema("doc_id LONG, text STRING")
        .parquet(s"$feed/*")
      val q = TextDedupIndex.curateStream(input, dir, out, ckpt,
        "doc_id", "text", cfg, Trigger.AvailableNow())
      q.awaitTermination()
    }
    Seq(novel(9500001L, "sw1")).toDF("doc_id", "text").write.parquet(s"$feed/b1")
    runOnce()
    assert(!orphan.exists(), "unreferenced staging orphan must be swept on start")
    Seq(novel(9500002L, "sw2")).toDF("doc_id", "text").write.parquet(s"$feed/b2")
    runOnce()
    // ledger hygiene: the idx-mark supersedes the out-mark, and marks of
    // committed batches are pruned — O(1) files, not one pair per batch
    val ledger = new java.io.File(s"$ckpt/graft-curate-ledger")
    val marks = ledger.listFiles().map(_.getName).filterNot(_.startsWith("."))
    assert(marks.length <= 1, s"ledger must stay bounded, holds: ${marks.mkString(",")}")
    assert(marks.forall(_.startsWith("idx-")),
      "only the newest idx-mark survives (out-marks die when their idx-mark lands)")
  }

  test("deleteDocs: deleted docs stop matching immediately; compaction removes rows and equals a fresh build") {
    val dir = GraftTestSpark.tmpDir("lsh-del")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val doomedIds = corpus.orderBy(col("doc_id")).limit(5)
      .select(col("doc_id")).as[Long].collect().toSet
    TextDedupIndex.deleteDocs(
      corpus.filter(col("doc_id").isin(doomedIds.toSeq: _*)).select(col("doc_id")),
      dir, "doc_id")
    // near-dups of the deleted docs no longer match them (tombstone path)
    val pairs = TextDedupIndex.searchNew(planted(1000000L), dir, "doc_id", "text", cfg)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.forall { case (_, cid, _, _) => !doomedIds(cid) },
      "tombstoned docs must not surface as matches")
    // compaction applies the deletes physically and clears the tombstones;
    // the search image equals an index freshly built without them
    TextDedupIndex.compact(spark, dir, maxFiles = 1000000)
    assert(!new java.io.File(s"$dir/tomb").exists(),
      "compaction must clear applied tombstones")
    val fresh = GraftTestSpark.tmpDir("lsh-del-fresh")
    TextDedupIndex.build(corpus.filter(!col("doc_id").isin(doomedIds.toSeq: _*)),
      "doc_id", "text", fresh, cfg)
    def image(d: String) = TextDedupIndex.searchNew(planted(1000000L), d, "doc_id", "text", cfg)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(image(dir) === image(fresh),
      "post-compaction search must equal a fresh build without the deleted docs")
    // re-deleting already-removed ids is a no-op
    TextDedupIndex.deleteDocs(
      spark.range(1).select(lit(doomedIds.head).as("doc_id")), dir, "doc_id")
    assert(image(dir) === image(fresh))
  }

  test("rebuild after delete clears stale tombstones (re-added docs match again)") {
    val dir = GraftTestSpark.tmpDir("lsh-rebuild")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val doomedIds = corpus.orderBy(col("doc_id")).limit(5)
      .select(col("doc_id")).as[Long].collect().toSet
    TextDedupIndex.deleteDocs(
      corpus.filter(col("doc_id").isin(doomedIds.toSeq: _*)).select(col("doc_id")),
      dir, "doc_id")
    assert(new java.io.File(s"$dir/tomb").exists())
    // rebuild IN PLACE without compacting first: the new generation
    // re-indexes the previously deleted ids; stale tombstones must not
    // anti-join them away (or be physically applied by a later compact)
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    assert(!new java.io.File(s"$dir/tomb").exists(),
      "rebuild must clear tombstones of the replaced generation")
    def matches(): Set[Long] =
      TextDedupIndex.searchNew(planted(1000000L), dir, "doc_id", "text", cfg)
        .as[(Long, Long, Long, Double)].collect().map(_._2).toSet
    // planted(...) docs are near-dups of exactly the 5 lowest-id docs
    assert(doomedIds.forall(matches()), "re-indexed docs must match again")
    TextDedupIndex.compact(spark, dir, maxFiles = 1)
    assert(doomedIds.forall(matches()),
      "compaction after rebuild must not delete the re-indexed rows")
  }

  test("a mismatched hash family fails loudly instead of joining foreign keys") {
    val dir = GraftTestSpark.tmpDir("lsh-index")
    TextDedupIndex.build(corpus, "doc_id", "text", dir, cfg)
    val e = intercept[IllegalArgumentException] {
      TextDedupIndex.searchNew(planted(1000000L), dir, "doc_id", "text",
        cfg.copy(portable = true))
    }
    assert(e.getMessage.contains("different MinHash family"))
  }
}
