package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}
import graft.functions.VectorFunctions.cosine
import graft.operators.RelationalOps.round6

/** Quality contract of SemDeDup that the byte-level oracle can't see:
  * the oracle proves the Spark and DuckDB computations agree, these tests
  * prove the computation MEANS what it claims — drops are always real
  * near-dups (precision 1.0 by construction: the pair cosine is exact, only
  * the candidate scope is cell-bounded), recall against the global all-pairs
  * baseline is measured, and at a production threshold on genuinely
  * near-identical vectors the cell stage loses nothing. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val cfg = SemDedup.Config(nCells = 16, threshold = 0.4)
  private def emb = Tables.load(spark, GraftTestSpark.sfDir, "embeddings")

  /** vec_ids having SOME lower-id neighbor with rounded cosine ≥ t —
    * the globally-droppable set (what a no-cell exact pass would drop). */
  private def globallyDroppable(df: org.apache.spark.sql.DataFrame, t: Double): Set[Long] = {
    val a = df.select(col("vec_id").as("a_id"), col("embedding").as("va"))
    val b = df.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
    a.join(b, col("a_id") < col("b_id"))
      .filter(round6(cosine(col("va"), col("vb"))) >= t)
      .select(col("b_id")).distinct().as[Long].collect().toSet
  }

  test("precision 1.0: every dropped vector has a real lower-id near-dup") {
    val dropped = SemDedup.semDedup(emb, "vec_id", "embedding", cfg)
      .filter(col("keep") === 0L).select(col("vec_id")).as[Long].collect().toSet
    val global = globallyDroppable(emb, cfg.threshold)
    assert(dropped.nonEmpty, "corpus-shaped check must not be vacuous")
    assert(dropped.subsetOf(global),
      s"cell-bounding may shrink the candidate scope but never invent a dup; " +
        s"phantom drops: ${dropped -- global}")
  }

  test("recall vs the exact all-pairs baseline is measured and bounded") {
    // The synthetic corpus is near-orthogonal (max pairwise cosine ≈ 0.51),
    // so threshold-0.4 pairs are WEAK near-dups and frequently straddle
    // cells — the SemDeDup premise (near-dups co-locate) only fully bites
    // at production thresholds on truly-near vectors (next test). Pin the
    // measured operating point here so a regression in cell assignment
    // (e.g. a tiebreak change scattering a cluster) is caught.
    val dropped = SemDedup.semDedup(emb, "vec_id", "embedding", cfg)
      .filter(col("keep") === 0L).select(col("vec_id")).as[Long].collect().toSet
    val global = globallyDroppable(emb, cfg.threshold)
    val recall = dropped.size.toDouble / global.size
    assert(recall >= 0.15, s"within-cell recall collapsed: $recall")
  }

  test("production threshold: near-identical clusters dedup exactly, min id survives") {
    // 3 clusters of 5 near-identical vectors (pairwise cosine ≈ 1) plus 20
    // mutually-orthogonal one-hot singletons. At threshold 0.95 every
    // cluster must collapse to its min-id member and no singleton may drop.
    val dim = 32
    val rows = (for {
      c <- 0 until 3
      m <- 0 until 5
    } yield {
      val base = Array.tabulate(dim)(i => math.sin(1.0 + c * 7 + i).toFloat)
      base(m % dim) = base(m % dim) + 0.001f * (m + 1) // tiny deterministic tilt
      (c * 5L + m, base.toSeq)
    }) ++ (0 until 20).map { i =>
      (100L + i, Array.tabulate(dim)(j => if (j == i % dim) 1.0f else 0.0f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(df, "vec_id", "embedding",
      SemDedup.Config(nCells = 4, threshold = 0.95))
      .select(col("vec_id"), col("keep")).as[(Long, Long)].collect().toMap
    for (c <- 0 until 3; m <- 0 until 5) {
      val id = c * 5L + m
      assert(out(id) === (if (m == 0) 1L else 0L),
        s"cluster $c member $m: expected ${if (m == 0) "keep" else "drop"}")
    }
    for (i <- 0 until 20)
      assert(out(100L + i) === 1L, s"singleton $i must survive")
  }

  test("deterministic under partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      SemDedup.semDedup(df, "vec_id", "embedding", cfg)
        .as[(Long, Long, Long)].collect().toSet
    assert(run(emb) === run(emb.repartition(7)))
  }

  test("hot-cell cap: skips are observable and never shrink the corpus") {
    val stats = SemDedup.cellStats(emb, "vec_id", "embedding", cfg.nCells)
      .as[(Long, Long)].collect().toMap
    val n = emb.count()
    assert(stats.values.sum === n, "census must total the corpus")
    def run(cap: Option[Int]) =
      SemDedup.semDedup(emb, "vec_id", "embedding", cfg, cap)
        .as[(Long, Long, Long)].collect().toSet
    val uncapped = run(None)
    // cap at the largest cell → nothing skipped, identical verdicts
    assert(run(Some(stats.values.max.toInt)) === uncapped)
    // cap below every cell → the pair stage never runs; every vector still
    // in the output, all keep (a skipped cell is a recall trade, not a
    // corpus shrink)
    val allSkipped = run(Some(stats.values.min.toInt - 1))
    assert(allSkipped.size === n)
    assert(allSkipped.forall(_._3 == 1L))
    // intermediate cap: capped drops ⊆ uncapped drops (precision preserved)
    val median = stats.values.toSeq.sorted.apply(stats.size / 2).toInt
    val capped = run(Some(median))
    def drops(s: Set[(Long, Long, Long)]) = s.filter(_._3 == 0L).map(_._1)
    assert(drops(capped).subsetOf(drops(uncapped)))
  }

  test("hard negatives: different label, true in-cell argmax, deterministic") {
    val mined = SemDedup.hardNegatives(emb, "vec_id", "embedding", "label", cfg.nCells)
    val rows = mined.as[(Long, Long, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    val labels = emb.select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    rows.foreach { case (id, _, negId, negLabel, _) =>
      assert(labels(negId) === negLabel, "neg_label must be the negative's own label")
      assert(labels(id) !== negLabel, s"vector $id mined a same-label negative")
      assert(id !== negId)
    }
    // independent formulation: window row_number over the same candidate
    // pairs must pick the identical (neg, score) per vector — pins the
    // aggregate argmax (max-of-struct) against a second implementation
    val asg = SemDedup.assignCells(emb, "vec_id", "embedding", cfg.nCells)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
    val a = asg.select(col("cell_id"), col("vec_id").as("a_id"),
      col("embedding").as("va"), col("label").as("la"))
    val b = asg.select(col("cell_id"), col("vec_id").as("b_id"),
      col("embedding").as("vb"), col("label").as("lb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("a_id"))
      .orderBy(col("score").desc, col("b_id"))
    val viaWindow = a.join(b, Seq("cell_id")).filter(col("la") =!= col("lb"))
      .withColumn("score", round6(cosine(col("va"), col("vb"))))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("a_id"), col("cell_id"), col("b_id"), col("lb"), col("score"))
      .as[(Long, Long, Long, Int, Double)].collect().toSet
    assert(rows.toSet === viaWindow)
    // partitioning invariance
    val again = SemDedup.hardNegatives(
      emb.repartition(7), "vec_id", "embedding", "label", cfg.nCells)
      .as[(Long, Long, Long, Int, Double)].collect().toSet
    assert(again === rows.toSet)
  }

  test("hard-negative cap: skipped cells yield no rows, small cells unchanged") {
    val stats = SemDedup.cellStats(emb, "vec_id", "embedding", cfg.nCells)
      .as[(Long, Long)].collect().toMap
    def run(cap: Option[Int]) =
      SemDedup.hardNegatives(emb, "vec_id", "embedding", "label", cfg.nCells, cap)
        .as[(Long, Long, Long, Int, Double)].collect().toSet
    val uncapped = run(None)
    // cap at the largest cell → nothing skipped, identical rows
    assert(run(Some(stats.values.max.toInt)) === uncapped)
    // cap below every cell → the pair stage never runs; zero rows (a hard
    // negative is optional training data — skipping yields no row, unlike
    // semDedup where membership must survive)
    assert(run(Some(stats.values.min.toInt - 1)).isEmpty)
    // intermediate cap: exactly the rows of the surviving (≤ cap) cells —
    // a skipped cell removes its rows and changes nothing anywhere else
    val median = stats.values.toSeq.sorted.apply(stats.size / 2).toInt
    val capped = run(Some(median))
    val keptCells = stats.filter(_._2 <= median).keySet
    assert(capped === uncapped.filter(r => keptCells.contains(r._2)))
  }

  test("hard-negative hot cell: one cell holding half the corpus is skippable") {
    // Adversarial corpus: ~half the vectors are tiny tilts of one base
    // direction (they all land in the same cell — the hot cell the VERDICT
    // names as the 100 TB job-killer), the rest are one-hot singletons.
    // The tilt is far below round6 resolution, so every hot member scores a
    // rounded 1.0 against every hot seed and the tiebreak funnels ALL of
    // them into the min-id hot seed's cell — one genuinely hot cell.
    val dim = 32
    val hot = (0 until 40).map { m =>
      val base = Array.tabulate(dim)(i => math.sin(1.0 + i).toFloat)
      base(m % dim) = base(m % dim) + 1e-5f * (m + 1)
      (m.toLong, base.toSeq, m % 3)
    }
    val cold = (0 until 40).map { i =>
      (100L + i, Array.tabulate(dim)(j => if (j == i % dim) 1.0f else 0.0f).toSeq, i % 3)
    }
    val df = (hot ++ cold).toDF("vec_id", "embedding", "label")
    val nCells = 8
    val stats = SemDedup.cellStats(df, "vec_id", "embedding", nCells)
      .as[(Long, Long)].collect().toMap
    val hotCellSize = stats.values.max
    assert(hotCellSize >= 40L, s"corpus must actually produce a hot cell: $stats")
    val capped = SemDedup.hardNegatives(df, "vec_id", "embedding", "label",
      nCells, Some(hotCellSize.toInt - 1))
      .as[(Long, Long, Long, Int, Double)].collect()
    // the hot cell is excluded; every surviving row is from a small cell,
    // so the pair stage examined at most Σ small² pairs — bounded by cap²
    val hotCell = stats.maxBy(_._2)._1
    assert(capped.forall(_._2 != hotCell))
    val uncapped = SemDedup.hardNegatives(df, "vec_id", "embedding", "label", nCells)
      .as[(Long, Long, Long, Int, Double)].collect().toSet
    assert(capped.toSet === uncapped.filter(_._2 != hotCell))
  }

  test("assignment covers every vector with at most nCells cells") {
    val asg = SemDedup.assignCells(emb, "vec_id", "embedding", cfg.nCells)
    assert(asg.count() === emb.count())
    val cells = asg.select(col("cell_id")).distinct().as[Long].collect().toSet
    assert(cells.size <= cfg.nCells)
    val seedIds = SemDedup.seeds(emb, "vec_id", "embedding", cfg.nCells)
      .select(col("seed_id")).as[Long].collect().toSet
    assert(cells.subsetOf(seedIds), "cell ids must be seed ids")
  }
}
