package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

class IvfSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, GraftTestSpark.sfDir, "embeddings").cache()

  test("training is deterministic and produces normalized centroids") {
    val c1 = IvfIndex.trainCentroids(emb, "embedding", IvfIndex.Config())
    val c2 = IvfIndex.trainCentroids(emb, "embedding", IvfIndex.Config())
    assert(c1 === c2)
    c1.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("IVF knn join finds the exact duplicate and beats random recall") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = SimilaritySearch.knnJoinBrute(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.knnJoinIVF(queries, emb, "vec_id", "embedding", 5,
      IvfIndex.Config(nCentroids = 16, nProbe = 8))
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // random embeddings are a worst case for a coarse quantizer; require a
    // clear margin over the ~nProbe/nCentroids=0.5 cell-coverage floor
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("persisted index: build/searchIndex equals the transient path exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    val cfg = IvfIndex.Config(nCentroids = 16, nProbe = 8)
    IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
    val queries = emb.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    val persisted = rows(
      IvfIndex.searchIndex(queries, dir, "vec_id", "embedding", 5, cfg.nProbe))
    val transient = rows(
      IvfIndex.knnJoinIVF(queries, emb, "vec_id", "embedding", 5, cfg))
    assert(persisted.nonEmpty)
    assert(persisted === transient,
      "the stored quantizer + inverted file must reproduce the transient search")
  }

  test("appendVectors assigns with stored centroids — no retrain, no loss") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-append").toString
    val cfg = IvfIndex.Config(nCentroids = 16, nProbe = 8)
    IvfIndex.build(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", dir, cfg)
    val before = IvfIndex.readCentroids(spark, dir)
    IvfIndex.appendVectors(
      emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding", dir)
    assert(IvfIndex.readCentroids(spark, dir) === before, "append must not retrain")
    // the inverted file now holds every vector exactly once
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() === emb.count())
    assert(cells.select("cand_id").distinct().count() === emb.count())
    // an appended (odd-id) vector is findable: its exact duplicate scores 1
    val dup = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 50000).as("vec_id"), col("embedding"), col("label"))
    IvfIndex.appendVectors(dup, "vec_id", "embedding", dir)
    val hits = IvfIndex.searchIndex(dup, dir, "vec_id", "embedding", 3, cfg.nProbe)
      .as[(Long, Long, Double, Long)].collect()
    assert(hits.exists(r => r._2 == 7L && r._3 >= 0.999999))
  }

  test("continuous appends keep the inverted file's file count bounded") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-compact").toString
    val cfg = IvfIndex.Config(nCentroids = 16, nProbe = 8)
    IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
    val queries = emb.filter(col("vec_id") < 20)
    val before = IvfIndex.searchIndex(queries, dir, "vec_id", "embedding", 5, cfg.nProbe)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    // 12 append waves of fresh ids; each writes up to defaultParallelism
    // files into cells/ — without compaction ~48 files, past the 32 threshold
    (0 until 12).foreach { i =>
      val wave = emb.filter(col("vec_id") < 8)
        .select((col("vec_id") + 100000L + i * 100L).as("vec_id"),
          col("embedding"), col("label"))
      IvfIndex.appendVectors(wave, "vec_id", "embedding", dir)
    }
    val files = new java.io.File(s"$dir/cells").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val bound = 8 * spark.sparkContext.defaultParallelism
    assert(files <= bound, s"cells/ holds $files files, threshold $bound")
    // compaction re-lays-out the same rows: original probes still find the
    // same original neighbors among the (now larger) corpus — re-derive on
    // the brute-force side to confirm nothing was lost or duplicated
    assert(spark.read.parquet(s"$dir/cells").count() === emb.count() + 12 * 8)
    assert(spark.read.parquet(s"$dir/cells")
      .select("cand_id").distinct().count() === emb.count() + 12 * 8)
    val after = IvfIndex.searchIndex(queries, dir, "vec_id", "embedding", 5, cfg.nProbe)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    // appended waves clone vec_id<8, so queries 0-7 legitimately gain
    // exact-dup neighbors; queries 8-19 saw no new competitive candidates
    assert(after.filter(_._1 >= 8) === before.filter(_._1 >= 8),
      "compaction must not change search results for unaffected queries")
  }

  // ---- recall drift --------------------------------------------------------

  /** Clustered synthetic corpus in 6-d: A-vectors sit on axes e0..e3 (4
    * tight clusters a 4-cell quantizer separates perfectly). Drifted
    * B-vectors occupy a brand-NEW direction (e4) the quantizer has no
    * centroid for: their cell assignment falls to the small dims-0..3 noise
    * (≈ a random cell among the four axis centroids), while true-neighbor
    * ranking is dominated by the much larger dim-5 spread — orthogonal to
    * the assignment signal. So a drifted probe's nearest neighbors are
    * scattered across cells it does not probe (nProbe=1), and recall decays
    * silently — the exact geometry "retrain when drift degrades recall"
    * exists for. */
  private def axisVec(axis: Int, r: scala.util.Random): Array[Float] = {
    val v = new Array[Float](6); v(axis) = 1f
    v(4) = (r.nextFloat() - 0.5f) * 0.3f; v(5) = (r.nextFloat() - 0.5f) * 0.3f; v
  }
  private def driftVec(r: scala.util.Random): Array[Float] = {
    val v = new Array[Float](6)
    (0 until 4).foreach(i => v(i) = (r.nextFloat() - 0.5f) * 0.5f)
    v(4) = 1f
    v(5) = (r.nextFloat() - 0.5f) * 1.6f
    v
  }

  test("recall drift is detected on a shifted append and repaired by retrain") {
    val rnd = new scala.util.Random(7L)
    val aVecs = (0 until 120).map(i => (i.toLong, axisVec(i % 4, rnd)))
    // 2× the standing corpus: drift big enough that a corpus-proportional
    // probe sample must surface it (a trace amount of drift SHOULD read as
    // high overall recall — the monitor measures the corpus as served)
    val bVecs = (0 until 240).map(i => (1000L + i, driftVec(rnd)))
    val dir = java.nio.file.Files.createTempDirectory("ivf-drift").toString
    val cfg = IvfIndex.Config(nCentroids = 4, nProbe = 1, iters = 10)
    IvfIndex.build(aVecs.toDF("vec_id", "embedding"), "vec_id", "embedding", dir, cfg)
    val recall0 = IvfIndex.recallEstimate(spark, dir, k = 5, sampleN = 64, nProbe = 1)
    assert(recall0 >= 0.9, s"on-distribution recall should be near-exact, got $recall0")
    // no drift yet: the trigger must NOT retrain
    val (r0, retrained0) = IvfIndex.retrainIfDrifted(spark, dir,
      threshold = 0.85, k = 5, sampleN = 64, cfg = cfg.copy(nProbe = 1))
    assert(!retrained0, s"no-drift estimate $r0 must not trigger a retrain")

    IvfIndex.appendVectors(bVecs.toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    val recall1 = IvfIndex.recallEstimate(spark, dir, k = 5, sampleN = 64, nProbe = 1)
    assert(recall1 < recall0 - 0.1,
      s"boundary-straddling drift must degrade measured recall: $recall0 -> $recall1")

    // the documented maintenance rule: retrain when measured recall sinks
    // below threshold — the rebuilt quantizer (trained on the drifted
    // corpus, with budget for the new clusters) recovers it
    val (rPre, retrained) = IvfIndex.retrainIfDrifted(spark, dir,
      threshold = 0.85, k = 5, sampleN = 64,
      cfg = IvfIndex.Config(nCentroids = 8, nProbe = 1, iters = 10))
    assert(retrained, s"recall $rPre below 0.85 must trigger a retrain")
    assert(rPre < 0.85)
    val recall2 = IvfIndex.recallEstimate(spark, dir, k = 5, sampleN = 64, nProbe = 1)
    assert(recall2 > recall1 + 0.05,
      s"retrain must recover recall: $recall1 -> $recall2")
    // nothing lost by the rebuild-from-cells
    assert(spark.read.parquet(s"$dir/cells").count() === 360L)
  }

  test("deleteVectors: ids vanish from search immediately; compaction removes rows and equals a fresh build") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-del").toString
    val cfg = IvfIndex.Config(nCentroids = 16, nProbe = 8)
    IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
    val doomed = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val doomedIds = doomed.as[Long].collect().toSet
    IvfIndex.deleteVectors(doomed, dir, "vec_id")
    val queries = emb.filter(col("vec_id") < 20)
    def rows(d: String) = IvfIndex.searchIndex(queries, d, "vec_id", "embedding", 5, cfg.nProbe)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    // immediate: no tombstoned id in any result (incl. self-matches)
    val tombstoned = rows(dir)
    assert(tombstoned.forall { case (_, cand, _, _) => !doomedIds(cand) },
      "tombstoned vectors must not surface in search results")
    // compaction is a PURE physical application of the tombstones: the
    // search image must be byte-identical before and after (the stored
    // quantizer is deliberately untouched — deletion never retrains; a
    // fresh build on the survivors would train DIFFERENT centroids and is
    // not the contract for a data-dependent quantizer)
    IvfIndex.compact(spark, dir, maxFiles = 1000000)
    assert(!new java.io.File(s"$dir/tomb").exists(),
      "compaction must clear applied tombstones")
    assert(rows(dir) === tombstoned,
      "compaction must not change the search image, only the storage")
    // and the rows are physically gone: an exhaustive probe of every cell
    // finds no doomed id anywhere in the inverted file
    val all = IvfIndex.searchIndex(queries, dir, "vec_id", "embedding",
        1000, nProbe = cfg.nCentroids)
      .select(col("cand_id")).as[Long].collect().toSet
    assert(all.nonEmpty && doomedIds.forall(!all(_)),
      "compaction must physically remove tombstoned rows from every cell")
  }

  test("rebuild after delete clears stale tombstones (reused ids are searchable)") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-rebuild").toString
    val cfg = IvfIndex.Config(nCentroids = 16, nProbe = 16)
    IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
    val doomed = emb.filter(col("vec_id") < 50).select(col("vec_id"))
    IvfIndex.deleteVectors(doomed, dir, "vec_id")
    assert(new java.io.File(s"$dir/tomb").exists())
    // rebuild IN PLACE without an intervening compaction — the retrain
    // path deleteVectors' own doc points to. The new generation re-adds
    // the previously deleted ids; stale tombstones must not suppress them.
    IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
    assert(!new java.io.File(s"$dir/tomb").exists(),
      "rebuild must clear tombstones of the replaced generation")
    val res = IvfIndex.searchIndex(
        emb.filter(col("vec_id") === 60), dir, "vec_id", "embedding", 500,
        nProbe = cfg.nCentroids)
      .select(col("cand_id")).as[Long].collect().toSet
    assert((0L until 50L).exists(res), "re-added ids must be searchable again")
    // and the next compaction must not physically delete their rows
    IvfIndex.compact(spark, dir, maxFiles = 1)
    val res2 = IvfIndex.searchIndex(
        emb.filter(col("vec_id") === 60), dir, "vec_id", "embedding", 500,
        nProbe = cfg.nCentroids)
      .select(col("cand_id")).as[Long].collect().toSet
    assert(res2 === res)
  }

  test("portable persisted lifecycle: search ≡ transient portable; append-then-forget ≡ fresh survivors build") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-portable").toString
    val survivors = emb.filter(col("vec_id") % 5 =!= 0)
    val victims = emb.filter(col("vec_id") % 5 === 0)
    val queries = survivors.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    IvfIndex.buildPortable(survivors, "vec_id", "embedding", dir, nCells = 16)
    val transient =
      rows(IvfIndex.knnJoinIVFPortable(queries, survivors, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 4))
    assert(transient.nonEmpty)
    assert(rows(IvfIndex.searchIndexPortable(queries, dir, "vec_id", "embedding",
      k = 5, nProbe = 4)) === transient,
      "the persisted portable index must reproduce the transient portable search")
    // append with STORED seeds, forget, compact: the end state must be
    // byte-identical to the fresh survivors-only build (the full-oracle
    // property e_knn_after_delete rides)
    IvfIndex.appendVectorsPortable(victims, "vec_id", "embedding", dir)
    IvfIndex.deleteVectors(victims.select(col("vec_id")), dir, "vec_id")
    IvfIndex.compact(spark, dir, maxFiles = 1)
    assert(!new java.io.File(s"$dir/tomb").exists())
    assert(rows(IvfIndex.searchIndexPortable(queries, dir, "vec_id", "embedding",
      k = 5, nProbe = 4)) === transient,
      "append-then-forget must converge to the fresh-on-survivors image")
  }

  test("calibrateNProbe reaches the 0.8 recall target at production sizing") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-calib").toString
    val cfg = IvfIndex.prodConfig(emb.count())
    IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
    val (np, recall) = IvfIndex.calibrateNProbe(spark, dir, target = 0.8)
    // converges by construction: at nProbe = nCells the search is exact
    assert(np >= 1 && np <= cfg.nCentroids, s"nProbe=$np cells=${cfg.nCentroids}")
    assert(recall >= 0.8, s"calibrated recall=$recall at nProbe=$np")
    // the calibrated width must be an honest reading of the same instrument
    val check = IvfIndex.recallEstimate(spark, dir, nProbe = np)
    assert(math.abs(check - recall) < 1e-9,
      "calibration must report the estimator's own reading")
  }

  test("self-similar vectors land in the same cell (dup search works)") {
    val dup = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 50000).as("vec_id"), col("embedding"), col("label"))
    val withDup = emb.unionByName(dup)
    val res = IvfIndex.knnJoinIVF(
      withDup.filter(col("vec_id") === 7), withDup, "vec_id", "embedding", 3,
      IvfIndex.Config(nCentroids = 16, nProbe = 2))
      .as[(Long, Long, Double, Long)].collect()
    assert(res.exists(r => r._2 == 50007L && r._3 >= 0.999999))
  }
}
