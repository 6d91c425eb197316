package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** MMR selection must equal an independent plain-Scala greedy on the same
  * fixed-point grid, be partitioning-invariant (the aggregate's merge order
  * must not change the answer), degrade to plain top-k at λ=1, actually
  * diversify at λ<1, and fail LOUDLY when fed a non-shortlist. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  // --- independent reference: the same arithmetic, reimplemented ---

  private def simInt(a: Array[Float], b: Array[Float]): Long = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    math.floor((if (nn == 0.0) 0.0 else d / nn) * 1e6 + 0.5).toLong
  }

  /** Greedy MMR over (id, relInt, vec) candidates: (id, relInt, rnk). */
  private def refMmr(cands: Seq[(Long, Long, Array[Float])], k: Int,
      lambdaNum: Int): Seq[(Long, Long, Int)] = {
    val lb = 1000L - lambdaNum
    var remaining = cands
    var selected = Vector.empty[(Long, Long, Array[Float])]
    val out = Seq.newBuilder[(Long, Long, Int)]
    var t = 1
    while (t <= k && remaining.nonEmpty) {
      val best = remaining.minBy { case (id, rel, v) =>
        val obj =
          if (selected.isEmpty) rel // round 1: pure relevance argmax, any λ
          else lambdaNum * rel - lb * selected.map(s => simInt(v, s._3)).max
        (-obj, id)
      }
      out += ((best._1, best._2, t))
      selected :+= best
      remaining = remaining.filterNot(_._1 == best._1)
      t += 1
    }
    out.result()
  }

  private def randomCands(n: Int, dim: Int, seed: Int): Seq[(Long, Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      // coarse rel grid on purpose: objective ties must fall to the id
      (i.toLong, rnd.nextInt(20) * 50000L, v)
    }
  }

  private def shortlistDf(qs: Seq[(Long, Seq[(Long, Long, Array[Float])])]) =
    qs.flatMap { case (q, cs) => cs.map(c => (q, c._1, c._2, c._3)) }
      .toDF("query_id", "cand_id", "rel", "cv")

  test("matches the independent greedy reference per query") {
    val qs = (0L until 5L).map(q => q -> randomCands(14, 8, seed = 100 + q.toInt))
    val got = Mmr.rerank(shortlistDf(qs), k = 6, lambdaNum = 700)
      .select(col("query_id"), col("cand_id"), col("rnk"))
      .as[(Long, Long, Long)].collect().toSet
    val expected = qs.flatMap { case (q, cs) =>
      refMmr(cs, 6, 700).map { case (id, _, rnk) => (q, id, rnk.toLong) }
    }.toSet
    assert(got === expected)
  }

  test("partition-count invariant (merge order can't change the answer)") {
    val qs = (0L until 4L).map(q => q -> randomCands(12, 6, seed = 40 + q.toInt))
    def run(parts: Int) =
      Mmr.rerank(shortlistDf(qs).repartition(parts), k = 5, lambdaNum = 600)
        .as[(Long, Long, Double, Long)].collect().toSet
    assert(run(1) === run(23))
  }

  test("lambda = 1.0 is plain top-k by relevance") {
    val qs = (0L until 3L).map(q => q -> randomCands(10, 6, seed = 7 + q.toInt))
    val got = Mmr.rerank(shortlistDf(qs), k = 4, lambdaNum = 1000)
      .select(col("query_id"), col("cand_id"), col("rnk"))
      .as[(Long, Long, Long)].collect().toSet
    val expected = qs.flatMap { case (q, cs) =>
      cs.sortBy { case (id, rel, _) => (-rel, id) }.take(4).zipWithIndex
        .map { case ((id, _, _), i) => (q, id, (i + 1).toLong) }
    }.toSet
    assert(got === expected)
  }

  test("lambda = 0 is pure diversity, but round 1 still picks the most relevant") {
    // With λ=0 the old code scored round 1 as 0 for every candidate and
    // picked the smallest id; the contract is that round 1 is an argmax
    // over relevance (there is nothing selected yet to be diverse from).
    val v0 = Array(1.0f, 0.0f, 0.0f)   // most relevant, NOT smallest id
    val v1 = Array(0.99f, 0.1f, 0.0f)  // near-dup of v0
    val v2 = Array(0.0f, 1.0f, 0.0f)   // orthogonal
    val sl = Seq(
      (0L, 5L, 990000L, v0), (0L, 1L, 980000L, v1), (0L, 2L, 500000L, v2)
    ).toDF("query_id", "cand_id", "rel", "cv")
    val got = Mmr.rerank(sl, k = 2, lambdaNum = 0)
      .select(col("cand_id"), col("rnk")).as[(Long, Long)].collect().toSet
    // round 1: cand 5 (highest rel); round 2: cand 2 (farthest from 5)
    assert(got === Set((5L, 1L), (2L, 2L)))
    // and it still matches the independent reference
    val qs = (0L until 3L).map(q => q -> randomCands(12, 6, seed = 40 + q.toInt))
    val ref = qs.flatMap { case (q, cs) =>
      refMmr(cs, 4, 0).map { case (id, rel, rnk) => (q, id, rnk.toLong) }
    }.toSet
    val full = Mmr.rerank(shortlistDf(qs), k = 4, lambdaNum = 0)
      .select(col("query_id"), col("cand_id"), col("rnk"))
      .as[(Long, Long, Long)].collect().toSet
    assert(full === ref)
  }

  test("diversifies: a planted near-duplicate of the top hit is deferred") {
    // cand 0 and 1 are near-identical and most relevant; cand 2 is distinct
    // and slightly less relevant. Plain top-2 picks {0, 1}; MMR picks {0, 2}.
    val v0 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val v1 = Array(0.999f, 0.01f, 0.0f, 0.0f)
    val v2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val sl = Seq(
      (0L, 0L, 990000L, v0), (0L, 1L, 980000L, v1), (0L, 2L, 900000L, v2)
    ).toDF("query_id", "cand_id", "rel", "cv")
    val mmr = Mmr.rerank(sl, k = 2, lambdaNum = 500)
      .select("cand_id").as[Long].collect().toSet
    assert(mmr === Set(0L, 2L))
    val plain = Mmr.rerank(sl, k = 2, lambdaNum = 1000)
      .select("cand_id").as[Long].collect().toSet
    assert(plain === Set(0L, 1L))
  }

  test("groups smaller than k return every candidate, MMR-ordered") {
    val sl = Seq((1L, 10L, 500000L, Array(1.0f, 0.0f)),
      (1L, 11L, 400000L, Array(0.0f, 1.0f)))
      .toDF("query_id", "cand_id", "rel", "cv")
    val got = Mmr.rerank(sl, k = 5, lambdaNum = 700)
      .select(col("cand_id"), col("rnk")).as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 1L), (11L, 2L)))
  }

  test("a non-shortlist input fails loudly at the maxCandidates guard") {
    val sl = shortlistDf(Seq(0L -> randomCands(20, 4, seed = 3)))
    val e = intercept[Exception] {
      Mmr.rerank(sl, k = 2, lambdaNum = 700, maxCandidates = 8).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("maxCandidates")))
  }

  test("production path: an ANN (LSH) shortlist feeds rerank directly") {
    // the scale composition — approximate shortlist, exact-grid MMR on top:
    // knnJoinLSH emits (query_id, cand_id, score, rnk); grid the score,
    // attach vectors, rerank. Contract checks: k rows per query (when the
    // shortlist has them), rnk 1..k, every pick a member of its own
    // shortlist, and the top pick = the shortlist's best rel (λ round 1).
    val e = graft.Tables.load(spark, GraftTestSpark.sfDir, "embeddings")
    val sl = SimilaritySearch.knnJoinLSH(
      e.filter(col("vec_id") < 4), e, "vec_id", "embedding",
      k = 12, SimilaritySearch.LshConfig(dim = 64))
      .select(col("query_id"), col("cand_id"),
        Mmr.grid6(col("score")).as("rel"))
      .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("cv")),
        Seq("cand_id"))
    val slRows = sl.select(col("query_id"), col("cand_id"), col("rel"))
      .as[(Long, Long, Long)].collect()
    val got = Mmr.rerank(sl, k = 4, lambdaNum = 700)
      .select(col("query_id"), col("cand_id"), col("rnk"))
      .as[(Long, Long, Long)].collect()
    val byQuery = got.groupBy(_._1)
    byQuery.foreach { case (q, picks) =>
      val shortlist = slRows.filter(_._1 == q)
      assert(picks.length === math.min(4, shortlist.length))
      assert(picks.map(_._3).sorted.toSeq === (1L to picks.length).toSeq)
      assert(picks.map(_._2).toSet.subsetOf(shortlist.map(_._2).toSet))
      val bestRel = shortlist.minBy(r => (-r._3, r._2))
      assert(picks.find(_._3 == 1L).get._2 === bestRel._2)
    }
  }

  test("diversifiedTopK end-to-end equals reference over the embeddings table") {
    val e = graft.Tables.load(spark, GraftTestSpark.sfDir, "embeddings")
    val got = Mmr.diversifiedTopK(
      e.filter(col("vec_id") < 3), e, "vec_id", "embedding",
      shortlist = 8, k = 3, lambdaNum = 700, excludeSelf = true)
      .select(col("query_id"), col("cand_id"), col("rnk"))
      .as[(Long, Long, Long)].collect().toSet

    val all = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val expected = all.filter(_._1 < 3).flatMap { case (q, qv) =>
      val scored = all.filter(_._1 != q)
        .map { case (id, v) => (id, simInt(v, qv), v) }
      val sl = scored.sortBy { case (id, rel, _) => (-rel, id) }.take(8).toSeq
      refMmr(sl, 3, 700).map { case (id, _, rnk) => (q, id, rnk.toLong) }
    }.toSet
    assert(got === expected)
  }
}
