package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{ConnectedComponents, TextDedup}
import graft.hedera._

/** Adversarial-skew battery: the pathologies VERDICT r3 asked the engine to
  * prove itself against — a 10⁴-duplicate hot key, a near-dup clique, LSH
  * buckets at the cap boundary, and a day holding half the corpus. Each
  * test asserts the documented degradation (correct result, bounded work,
  * observable drop counts), not just survival.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val dayNs = 86400L * 1000000000L
  private val t0 = 1600000000L * 1000000000L

  private def mkTable(): TransactionsTable =
    new TransactionsTable(spark, GraftTestSpark.tmpDir("skew") + "/transactions")

  private def writeDays(table: TransactionsTable, ns: Seq[Long]): Unit =
    TestRows.writeDays(spark, table, ns)

  test("hot key: a 10^4-duplicate group repairs correctly in one run") {
    val table = mkTable()
    val state = new StateStore(spark, GraftTestSpark.tmpDir("skew-state") + "/state")
    val job = new Deduplication.Job(spark, table, state,
      Deduplication.Config(catchupIntervalUs = Long.MaxValue / 4))
    val hot = Seq.fill(10000)(t0 + 500L)
    val background = (1 to 2000).map(i => t0 + i * 1000000L) // spread over the day
    writeDays(table, scala.util.Random.shuffle(hot ++ background))
    val res = job.runIncremental()
    assert(res.duplicatesRemoved === 9999)
    assert(table.read().count() === 2001)
    assert(table.read().filter(col("consensusTimestamp") === t0 + 500L).count() === 1)
  }

  test("near-dup clique: uncapped LSH finds it, CC closes it in O(1) rounds") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = (0 until 800).map(i => (i.toLong, s"$base unique$i")).toDF("doc_id", "text")
    val cfg = TextDedup.MinHashConfig(maxBucket = 1 << 20)
    val pairs = TextDedup.nearDuplicatePairs(docs, "doc_id", "text", cfg)
      .select("a_id", "b_id")
    val (labels, rounds) = ConnectedComponents.componentsWithRounds(pairs, "a_id", "b_id")
    val comps = labels.select("component").distinct().count()
    assert(comps === 1, "the clique must resolve to ONE component")
    assert(labels.count() === 800, "every clique member labeled")
    assert(rounds <= 3, s"clique must close in O(1) label rounds, took $rounds")
    val survivors = TextDedup.minHashDedup(docs, "doc_id", "text", cfg).count()
    assert(survivors === 1, "cluster-based dedupe keeps exactly one representative")
  }

  test("near-dup clique under the default cap degrades gracefully and reports drops") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = (0 until 800).map(i => (i.toLong, s"$base unique$i")).toDF("doc_id", "text")
    val cfg = TextDedup.MinHashConfig() // maxBucket = 64
    val sigs = TextDedup.signatures(docs, "doc_id", "text", cfg)
      .filter(size(col("sh")) > 0)
    val stats = TextDedup.lshBucketStats(sigs, cfg).first()
    assert(stats.getAs[Long]("dropped_buckets") > 0,
      "a 800-doc clique must overflow capped band buckets")
    assert(stats.getAs[Long]("dropped_rows") > 0)
    // The capped pipeline still completes with bounded fan-out: every
    // surviving bucket pairs at most C(64,2) rows, so the candidate set is
    // a tiny fraction of the clique's C(800,2).
    val pairs = TextDedup.nearDuplicatePairs(docs, "doc_id", "text", cfg).count()
    assert(pairs < 800L * 799 / 2 / 10, s"capped run must not blow up, got $pairs")
  }

  test("5k-doc near-dup clique under the default cap: bounded work, drops observable") {
    // The full-size clique from the round brief. Uncapped, its pair set is
    // C(5000,2) ≈ 12.5M — the cap must keep the capped pipeline's work
    // bounded while the drop census shows exactly what was given up.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = (0 until 5000).map(i => (i.toLong, s"$base unique$i")).toDF("doc_id", "text")
    val cfg = TextDedup.MinHashConfig() // maxBucket = 64
    val sigs = TextDedup.signatures(docs, "doc_id", "text", cfg)
      .filter(size(col("sh")) > 0)
    val stats = TextDedup.lshBucketStats(sigs, cfg).first()
    assert(stats.getAs[Long]("dropped_rows") > 0)
    val pairs = TextDedup.nearDuplicatePairs(docs, "doc_id", "text", cfg).count()
    // every surviving bucket contributes at most C(maxBucket, 2) pairs
    val bound = stats.getAs[Long]("total_buckets") *
      cfg.maxBucket * (cfg.maxBucket - 1) / 2
    assert(pairs <= bound, s"capped pair count $pairs exceeded the bucket bound $bound")
    assert(pairs < 5000L * 4999 / 2 / 100, s"capped run must not approach O(n²), got $pairs")
  }

  test("LSH bucket exactly at the cap boundary: kept at m = cap, dropped at m = cap+1") {
    val cfg = TextDedup.MinHashConfig(maxBucket = 8)
    val filler = Seq(
      (100L, "completely different words about weather patterns today"),
      (101L, "another unrelated sentence mentioning database engines loudly"))
    def cliqueOf(m: Int) =
      ((0 until m).map(i => (i.toLong, "the exact same duplicated text body repeated verbatim")) ++
        filler).toDF("doc_id", "text")

    val atCap = TextDedup.nearDuplicatePairs(cliqueOf(8), "doc_id", "text", cfg)
    assert(atCap.count() === 8L * 7 / 2, "bucket of exactly maxBucket pairs fully")

    val overCap = cliqueOf(9)
    val pairs = TextDedup.nearDuplicatePairs(overCap, "doc_id", "text", cfg)
    assert(pairs.count() === 0, "bucket one over the cap is dropped whole")
    val sigs = TextDedup.signatures(overCap, "doc_id", "text", cfg)
      .filter(size(col("sh")) > 0)
    val stats = TextDedup.lshBucketStats(sigs, cfg).first()
    assert(stats.getAs[Long]("dropped_buckets") === cfg.bands.toLong,
      "identical docs collapse every band into one over-cap bucket")
    assert(stats.getAs[Long]("dropped_rows") === 9L * cfg.bands)
  }

  test("hot day + hot key corpus: ingest conserves rows, dedupe restores uniqueness") {
    val outDir = GraftTestSpark.tmpDir("skew-corpus") + "/in"
    val lines = GenSkew.skewedJsonCorpus(spark, GraftTestSpark.sfDir, outDir,
      hotCopies = 5000)
    val corpus = spark.read.text(outDir)
      .select(regexp_extract(col("value"),
        "\"consensusTimestamp\"\\s*:\\s*(-?\\d+)", 1).cast("long").as("ts"))
    val distinctKeys = corpus.select("ts").distinct().count()
    assert(corpus.count() === lines)
    // the planted pathologies are actually present: one day carries ~half
    // of the DISTINCT keys (lines would double-count the hot key's
    // replicas, which land on a different day), and the hot key repeats
    // thousands of times
    val dayShare = corpus.groupBy(to_date(timestamp_micros(expr("ts div 1000"))))
      .agg(countDistinct("ts").as("n")).agg(max("n")).first().getLong(0)
      .toDouble / distinctKeys
    assert(dayShare > 0.35 && dayShare < 0.75, s"hot-day share was $dayShare")
    val hotKeyCount = corpus.groupBy("ts").count().agg(max("count")).first().getLong(0)
    assert(hotKeyCount >= 5000, s"hot key must carry its replicas, got $hotKeyCount")

    val base = GraftTestSpark.tmpDir("skew-wh")
    val table = new TransactionsTable(spark, s"$base/transactions")
    val errors = new ErrorsTable(spark, s"$base/errors")
    val pipe = new IngestPipeline(spark, table, errors, preDedupe = false)
    val (ok, bad) = pipe.ingestBatch(outDir)
    assert(ok === lines && bad === 0, "every skewed line lands")
    // files-per-day layout bound holds on the 50%-of-rows day
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dayFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/transactions"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
      .map(d => fs.listStatus(d.getPath).count(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")))
    assert(dayFiles.max <= table.filesPerDay,
      s"hot day exceeded the files-per-day bound: ${dayFiles.max}")

    val job = new Deduplication.Job(spark, table,
      new StateStore(spark, s"$base/state"),
      Deduplication.Config(catchupIntervalUs = Long.MaxValue / 4))
    val res = job.runIncremental()
    assert(res.duplicatesRemoved === lines - distinctKeys)
    assert(table.read().count() === distinctKeys)
  }

  test("hot join key: one customer owns half the orders; join + window stay correct") {
    val dir = GraftTestSpark.tmpDir("joinskew")
    val hot = GenSkew.skewedJoinDir(spark, GraftTestSpark.sfDir, dir)
    val orders = Tables.load(spark, dir, "orders")
    val total = orders.count()
    val hotCnt = orders.filter(col("o_custkey") === hot).count()
    assert(hotCnt >= total / 2, s"hot customer must own ≥ half of orders ($hotCnt/$total)")

    // the per-customer ranking window with a 50%-of-rows partition: the hot
    // customer's top-3 must match an independent driver-side sort
    val got = graft.queries.Registry.byName("q_window_rank").build(spark, dir)
      .filter(col("o_custkey") === hot)
      .orderBy(col("rnk")).select(col("o_orderkey")).as[Long].collect().toSeq
    val want = orders.filter(col("o_custkey") === hot)
      .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)].collect()
      .sortBy { case (k, p) => (-p, k) }.take(3).map(_._1).toSeq
    assert(got === want, "hot-partition window rank must stay exact")

    // the join chain re-planned over the skewed orders completes and keeps
    // its contract (top-10, revenue-descending)
    val q3 = graft.queries.Registry.byName("q3_shipping").build(spark, dir)
      .select(col("revenue")).as[Double].collect().toSeq
    assert(q3.length <= 10)
    assert(q3 === q3.sortBy(-_), "q3 ordering contract holds under join skew")
  }

  test("q_window_rank carries a map-side WindowGroupLimit below the exchange") {
    // A rank-limit window partitioned on a hot key is NOT AQE-skew-
    // splittable: the defense is InferWindowGroupLimit's PARTIAL group
    // limit below the shuffle, which caps the hot key's exchange
    // contribution at k rows PER MAP TASK (top-3 here) instead of 50% of
    // the corpus. Pin that shape: if a plan change (filter moved off the
    // rank column, threshold exceeded, rule disabled) ever drops the
    // partial limit, the skew bench's wrank ratio quietly decays — this
    // catches it at test time. Adjudicated r10: quiet-host wrank ratio
    // 1.06 with this plan; the r9 reading of 1.33 was host contention.
    val plan = graft.queries.Registry.byName("q_window_rank")
      .build(spark, GraftTestSpark.sfDir)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val iLimits = lines.zipWithIndex.collect {
      case (l, i) if l.contains("WindowGroupLimit") => i }
    val iExchange = lines.indexWhere(_.contains("Exchange"))
    assert(iLimits.size === 2, s"expected partial+final WindowGroupLimit:\n$plan")
    assert(iExchange >= 0 && iLimits.max > iExchange,
      s"partial WindowGroupLimit must sit BELOW the exchange:\n$plan")
  }
}
