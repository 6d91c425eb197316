package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Semantic checks for the round-10 additions that the driver's value-hash
  * compare can't express: tercile geometry for t_ccnet_buckets, brute-force
  * re-verification for t_collocations, recall floor for e_knn_bq. */
class CcnetCollocBqSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sfDir

  test("t_ccnet_buckets: buckets are score-monotone per language and cover all scored docs") {
    val out = Registry.byName("t_ccnet_buckets").build(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      def mx(b: String) = byBucket.get(b).map(_.max)
      def mn(b: String) = byBucket.get(b).map(_.min)
      for (t <- mx("tail"); m <- mn("middle"))
        assert(t <= m, s"$lang: tail/middle overlap")
      for (m <- mx("middle"); h <- mn("head"))
        assert(m <= h, s"$lang: middle/head overlap")
      // terciles of a non-degenerate language are all inhabited
      if (rows.map(_._2).distinct.length >= 3)
        assert(byBucket.keySet == Set("tail", "middle", "head"), s"$lang: $byBucket")
    }
  }

  test("t_collocations: every emitted pair re-verifies against brute-force counts") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(split(trim(lower(col("text"))), "\\s+").as("ws"))
      .as[Seq[String]].collect()
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = docs.filter(_.length >= 2)
      .flatMap(ws => ws.zip(ws.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = big.values.sum
    val expected = big.filter { case ((w1, w2), c) =>
      c >= 3 && c * n >= 2 * uni(w1) * uni(w2)
    }.map { case ((w1, w2), c) => (w1, w2, c, uni(w1), uni(w2)) }.toSet
    // the joins put join keys first, so select by name rather than position
    val byName = Registry.byName("t_collocations").build(spark, sf)
      .select("w1", "w2", "c_xy", "c1", "c2")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(byName == expected)
    assert(byName.nonEmpty)
  }

  test("t_vocab_growth: cumulative vocab is monotone and totals the distinct-term count") {
    val rows = Registry.byName("t_vocab_growth").build(spark, sf)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (b, _, _) => b >= 0 && b <= 9 })
    rows.sliding(2).foreach {
      case Array((_, _, c1), (_, n2, c2)) => assert(c2 == c1 + n2)
      case _ =>
    }
    val distinctTerms = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .distinct().count()
    assert(rows.last._3 == distinctTerms)
  }

  test("t_hybrid_rrf: fusion is consistent with its two legs") {
    val rows = Registry.byName("t_hybrid_rrf").build(spark, sf).collect()
    assert(rows.length == 10)
    val fused = rows.map { r =>
      val rl = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rd = if (r.isNullAt(2)) None else Some(r.getLong(2))
      (r.getLong(0), rl, rd, r.getDouble(3))
    }
    // every returned doc appears in at least one leg, and the rrf value
    // recomputes from the ranks
    fused.foreach { case (id, rl, rd, rrf) =>
      assert(rl.isDefined || rd.isDefined, s"doc $id in neither leg")
      val expect = rl.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-6, s"doc $id rrf $rrf vs $expect")
    }
    // output is sorted by fused score desc
    assert(fused.map(_._4).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // a doc that tops BOTH legs must top the fusion
    fused.find(f => f._2.contains(1L) && f._3.contains(1L))
      .foreach(f => assert(f._1 == fused.head._1))
  }

  test("e_knn_bq: shortlist rerank recovers >= 8 of the exact top-10") {
    val exact = Registry.byName("e_cosine_topk").build(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val bq = Registry.byName("e_knn_bq").build(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(bq.size == 10)
    assert((bq & exact).size >= 8, s"recall ${(bq & exact).size}/10")
  }
}
