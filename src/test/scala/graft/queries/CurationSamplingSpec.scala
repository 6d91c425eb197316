package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftTestSpark

/** Semantic pins for the shard-shuffle / mixture-sampling / best-of-cluster
  * curation operators (their byte-for-byte values are pinned by the DuckDB
  * oracle gate; these assert the INVARIANTS a training pipeline relies on).
  */
class CurationSamplingSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val dir = GraftTestSpark.sfDir

  private def run(name: String) =
    Registry.byName(name).build(spark, dir)

  test("t_shard_shuffle is a permutation: every doc once, positions contiguous per shard") {
    val df = run("t_shard_shuffle").cache()
    try {
      val docs = graft.Tables.load(spark, dir, "documents")
      assert(df.count() == docs.count())
      assert(df.select("doc_id").distinct().count() == docs.count())
      // Per shard: pos is exactly 1..n (max == count and distinct == count).
      val bad = df.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"),
          countDistinct("pos").as("nd"))
        .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
        .count()
      assert(bad == 0L)
      // The salted hash spreads docs: every shard is populated at sf0.001
      // (~100+ docs over 16 shards) and no shard holds the majority.
      val sizes = df.groupBy("shard").count().collect().map(_.getLong(1))
      assert(sizes.length == 16)
      assert(sizes.max < df.count() / 2)
    } finally df.unpersist()
  }

  test("t_shard_shuffle is deterministic across runs") {
    val a = run("t_shard_shuffle").collect().toSet
    val b = run("t_shard_shuffle").collect().toSet
    assert(a == b)
  }

  test("t_mix_sample admits exactly the prefix of the per-source hash order within budget") {
    val df = run("t_mix_sample").cache()
    try {
      // Every admitted doc starts inside its source's budget.
      assert(df.filter(col("start_off") >= col("budget")).count() == 0L)
      // Budgets are per-source constants in [200, 1000).
      val budgets = df.select("source", "budget").distinct()
      assert(budgets.groupBy("source").count().filter(col("count") > 1).count() == 0L)
      assert(df.filter(col("budget") < 200L || col("budget") >= 1000L).count() == 0L)
      // Prefix property: per source, the admitted set's token mass equals
      // max(start_off) + its doc's tokens — no gaps in the running sum.
      val agg = df.groupBy("source").agg(
        sum("n_tokens").as("mass"),
        max(struct(col("start_off"), col("n_tokens"))).as("last"))
      val bad = agg.filter(
        col("mass") =!= col("last.start_off") + col("last.n_tokens")).count()
      assert(bad == 0L)
    } finally df.unpersist()
  }

  test("t_mix_sample two-phase running sum equals the flat per-source prefix sum") {
    // Recompute start_off the naive way (one window per source) and compare.
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, dir, "documents")
    val base = docs.select(col("doc_id"), col("source"),
      tokenCount(col("text")).as("n_tokens"),
      portableHash60(concat(lit("mix:"), col("doc_id").cast("string"))).as("h"))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flat = base
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("start_off"))
    val twoPhase = run("t_mix_sample").select(col("doc_id"), col("start_off"))
    // Compare on the admitted subset (flat restricted by join).
    val diff = twoPhase.as("a").join(flat.as("b"), Seq("doc_id"))
      .filter(col("a.start_off") =!= col("b.start_off")).count()
    assert(diff == 0L)
  }

  test("mixSample under a hot source (99% of docs): two-phase still equals the flat window") {
    // The decomposition exists FOR this shape — one source dominating the
    // corpus. 5000 hot + 50 cold docs; budgets force a cut inside the hot
    // source's hash order.
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val synth = ((1 to 5000).map(i => (i.toLong, "hot", s"tok a b c d e f g $i")) ++
      (1 to 50).map(i => ((100000 + i).toLong, s"cold${i % 5}", s"x y z $i")))
      .toDF("doc_id", "source", "text")
    val twoPhase = TextQueries.mixSample(synth)
      .select(col("doc_id"), col("start_off")).cache()
    try {
      val base = synth.select(col("doc_id"), col("source"),
        tokenCount(col("text")).as("n_tokens"),
        portableHash60(concat(lit("mix:"), col("doc_id").cast("string"))).as("h"))
      val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val budget = pmod(portableHash60(concat(lit("budget:"), col("source"))), lit(800L)) + 200L
      val flat = base
        .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .withColumn("budget", budget)
        .filter(col("start_off") < col("budget"))
        .select(col("doc_id"), col("start_off"))
      assert(twoPhase.count() == flat.count())
      assert(twoPhase.as("a").join(flat.as("b"), Seq("doc_id"))
        .filter(col("a.start_off") =!= col("b.start_off")).count() == 0L)
      // Non-vacuous: the hot source actually got cut (admitted < offered).
      assert(twoPhase.count() < 5050L)
      assert(twoPhase.count() > 0L)
    } finally twoPhase.unpersist()
  }

  test("temperatureBudgets: √-proportional, integer-exact, and sums within the total") {
    // 100× the token mass must earn ~10× (√100) the budget — NOT 100×
    // (that would be proportional sampling) and NOT ~1× (a hard cap).
    import spark.implicits._
    val synth = ((1 to 2000).map(i => (i.toLong, "big", s"a b c d e f g h $i")) ++
      (1 to 20).map(i => ((90000 + i).toLong, "small", s"a b c d e f g h $i")))
      .toDF("doc_id", "source", "text")
    val buds = TextQueries.temperatureBudgets(synth, 9000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ratio = buds("big").toDouble / buds("small").toDouble
    assert(ratio > 8.0 && ratio < 12.0,
      s"√-temperature ratio drifted: $ratio (budgets $buds)")
    // truncating division can only under-spend, never over-spend
    assert(buds.values.sum <= 9000L)
    // integer determinism: a second derivation is bit-identical
    val again = TextQueries.temperatureBudgets(synth.repartition(7), 9000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === buds)
  }

  test("mixSample under temperature budgets admits exactly the per-source prefix") {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val synth = ((1 to 500).map(i => (i.toLong, "big", s"a b c d $i")) ++
      (1 to 40).map(i => ((90000 + i).toLong, s"small${i % 2}", s"x y $i")))
      .toDF("doc_id", "source", "text")
    val buds = TextQueries.temperatureBudgets(synth, 600L)
    val got = TextQueries.mixSample(synth, budgets = Some(buds))
      .select(col("doc_id"), col("start_off")).cache()
    try {
      val base = synth.select(col("doc_id"), col("source"),
        tokenCount(col("text")).as("n_tokens"),
        portableHash60(concat(lit("mix:"), col("doc_id").cast("string"))).as("h"))
      val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val flat = base
        .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .join(buds, Seq("source"))
        .filter(col("start_off") < col("budget"))
        .select(col("doc_id"), col("start_off"))
      assert(got.count() == flat.count() && got.count() > 0L)
      assert(got.as("a").join(flat.as("b"), Seq("doc_id"))
        .filter(col("a.start_off") =!= col("b.start_off")).count() == 0L)
    } finally got.unpersist()
  }

  test("x_pair_contrastive: one pair per doc, negative never the positive, deterministic") {
    val df = run("x_pair_contrastive").cache()
    try {
      assert(df.count() == graft.Tables.load(spark, dir, "documents").count())
      assert(df.filter(col("neg_vec_id") === col("doc_id")).count() == 0L)
      assert(df.groupBy("doc_id").count().filter(col("count") > 1).count() == 0L)
      assert(run("x_pair_contrastive").collect().toSet == df.collect().toSet)
    } finally df.unpersist()
  }

  test("t_sample_k_per_group: exactly min(k, stratum size) distinct docs per lang, deterministic") {
    import spark.implicits._
    val sample = run("t_sample_k_per_group")
      .select(col("lang"), col("doc_id")).as[(String, Long)].collect()
    val strata = graft.Tables.load(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val byLang = sample.groupBy(_._1)
    assert(byLang.keySet === strata.keySet, "every stratum must be represented")
    byLang.foreach { case (lang, rows) =>
      assert(rows.length === math.min(20L, strata(lang)), s"stratum $lang")
      assert(rows.map(_._2).distinct.length === rows.length, s"duplicate picks in $lang")
    }
    // partial-aggregation merge order must not matter: the same pick over a
    // 7-way repartitioned input (different per-partition top-k merges) must
    // select the identical sample
    val h = pmod(graft.functions.TextFunctions.portableHash60(
      concat(lit("samplek:"), col("doc_id").cast("string"))), lit(1L << 50))
    val again = graft.Tables.load(spark, dir, "documents").repartition(7)
      .select(col("lang"), col("doc_id"), (-h.cast("double")).as("negh"))
      .groupBy(col("lang"))
      .agg(graft.expressions.TopKByScore(col("negh"), col("doc_id"), 20).as("picks"))
      .select(col("lang"), explode(col("picks.id")).as("doc_id"))
      .as[(String, Long)].collect()
    assert(again.toSet === sample.toSet)
  }

  test("t_best_of_cluster keeps exactly one max-quality survivor per cluster") {
    val surv = run("t_best_of_cluster").cache()
    try {
      // One survivor per cluster id.
      assert(surv.groupBy("cluster_id").count().filter(col("count") > 1).count() == 0L)
      // Survivor quality is the cluster max (recompute independently).
      val docs = graft.Tables.load(spark, dir, "documents")
      val q = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      val clusters = Registry.byName("t_dup_clusters").build(spark, dir)
      val maxQ = clusters.join(q, "doc_id")
        .groupBy("cluster_id").agg(max("q").as("max_q"), count(lit(1)).as("n"))
      val joined = surv.join(maxQ, "cluster_id")
      assert(joined.filter(col("quality") =!= col("max_q")).count() == 0L)
      assert(joined.filter(col("n_members") =!= col("n")).count() == 0L)
      // Cluster coverage: one survivor per distinct cluster.
      assert(surv.count() == clusters.select("cluster_id").distinct().count())
    } finally surv.unpersist()
  }
}
