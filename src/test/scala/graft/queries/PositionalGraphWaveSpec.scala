package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Brute-force re-verification for the round-10 positional/graph/feedback
  * wave — the semantic half the driver's value-hash compare can't express:
  * each entry is recomputed from first principles in plain Scala over the
  * collected corpus and must match exactly (or, for the KMV sketch, within
  * its accuracy contract).
  */
class PositionalGraphWaveSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sfDir

  private def docTokens(): Array[(Long, Array[String])] = {
    import spark.implicits._
    graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("ws"))
      .as[(Long, Array[String])].collect()
  }

  private def shingles(ws: Array[String], k: Int): Array[String] =
    if (ws.length < k) Array.empty
    else ws.sliding(k).map(_.mkString(" ")).toArray

  test("q_funnel: stage counts match a per-user sequential replay") {
    import spark.implicits._
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tu"))
      .as[(Long, String, Long)].collect()
    val dl = 86400000000L
    val byUser = events.groupBy(_._1)
    def firstAfter(es: Array[(Long, String, Long)], typ: String,
        after: Option[Long]): Option[Long] = after.flatMap { a =>
      val c = es.filter(e => e._2 == typ && e._3 > a && e._3 <= a + dl)
      if (c.isEmpty) None else Some(c.map(_._3).min)
    }
    var c = Array(0L, 0L, 0L, 0L)
    byUser.foreach { case (_, es) =>
      val signups = es.filter(_._2 == "signup")
      val s1 = if (signups.isEmpty) None else Some(signups.map(_._3).min)
      val s2 = firstAfter(es, "view", s1)
      val s3 = firstAfter(es, "click", s2)
      val s4 = firstAfter(es, "purchase", s3)
      Seq(s1, s2, s3, s4).zipWithIndex.foreach { case (o, i) =>
        if (o.isDefined) c(i) += 1
      }
    }
    val got = Registry.byName("q_funnel").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> c(0), 2L -> c(1), 3L -> c(2), 4L -> c(3)))
    // funnel counts are monotone non-increasing by construction
    assert(c(0) >= c(1) && c(1) >= c(2) && c(2) >= c(3))
  }

  test("t_triangle_count: per-node counts match brute force over the rare-gram graph") {
    val dg = docTokensRaw().flatMap { case (id, ws) =>
      shingles(ws, 3).distinct.map(g => (id, g))
    }
    val df = dg.groupBy(_._2).view.mapValues(_.length).toMap
    val rare = dg.filter { case (_, g) => df(g) >= 2 && df(g) <= 4 }
    val edges = rare.groupBy(_._2).values.flatMap { members =>
      val ids = members.map(_._1).distinct.sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet
    val byU = edges.groupBy(_._1)
    val triCount = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- edges; (_, c) <- byU.getOrElse(b, Set.empty) if edges((a, c))) {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    val got = Registry.byName("t_triangle_count").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == triCount.toMap)
  }

  test("t_phrase_search: positional intersection equals substring-count brute force") {
    val toks = docTokens()
    val triCounts = toks.flatMap { case (_, ws) => shingles(ws, 3) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val phrase = triCounts.toSeq.sortBy { case (g, n) => (-n, g) }.head._1
    val expected = toks.flatMap { case (id, ws) =>
      val occ = shingles(ws, 3).zipWithIndex.filter(_._1 == phrase).map(_._2 + 1L)
      if (occ.isEmpty) None else Some((id, occ.length.toLong, occ.min))
    }.toSet
    val got = Registry.byName("t_phrase_search").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("t_proximity_search: slop-window pairs match brute force") {
    val toks = docTokens()
    val tf = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val Seq(w1, w2) = tf.toSeq.sortBy { case (t, n) => (-n, t) }.take(2).map(_._1)
    val expected = toks.flatMap { case (id, ws) =>
      val pa = ws.zipWithIndex.filter(_._1 == w1).map(_._2 + 1L)
      val pb = ws.zipWithIndex.filter(_._1 == w2).map(_._2 + 1L)
      val ds = for (a <- pa; b <- pb if math.abs(a - b) <= 5) yield math.abs(a - b)
      if (ds.isEmpty) None else Some((id, ds.length.toLong, ds.min))
    }.toSet
    val got = Registry.byName("t_proximity_search").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("t_kmv_distinct: estimator honors its contract per source") {
    val rows = Registry.byName("t_kmv_distinct").build(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, k, est, exact) =>
      assert(k <= 64, src)
      if (k < 64) assert(est == exact, s"$src: degenerate case must be exact")
      else {
        assert(est >= 64, src)
        // KMV k=64 has ~12.5% relative std err; 4 sigma guard
        assert(math.abs(est - exact).toDouble / exact <= 0.5,
          s"$src: est $est vs exact $exact")
      }
    }
  }

  test("t_prf_rm3: ranks are dense and ordered; expansion grew the query") {
    val rows = Registry.byName("t_prf_rm3").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byRank = rows.sortBy(_._2)
    assert(byRank.map(_._2).toSeq == (1L to rows.length).toSeq)
    byRank.sliding(2).foreach {
      case Array((_, _, _, s1), (_, _, _, s2)) => assert(s1 >= s2)
      case _ => ()
    }
    // expanded query is top-3 ∪ 5 expansion terms: matched terms can reach 8
    assert(rows.map(_._3).max <= 8)
    assert(rows.map(_._3).max > 3, "expansion terms never matched any doc")
  }

  test("m_audio_fingerprint: dominant delta matches a replay of the planted waveform") {
    val rows = Registry.byName("m_audio_fingerprint").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val expected = rows.map { case (id, _, _, _, _) =>
      val n = graft.multimodal.Multimodal.plantedSampleCount(id)
      val peaks = (0 until n).grouped(64).map { frame =>
        frame.map(i => graft.multimodal.Multimodal.plantedSample(id, i)).max.toLong
      }.toArray
      val dvs = peaks.sliding(2).map(p => p(1) - p(0)).toArray
      val dom = dvs.groupBy(identity).toSeq
        .sortBy { case (dv, occ) => (-occ.length, dv) }.head
      id -> ((dom._1, dom._2.length.toLong, peaks.length.toLong))
    }.toMap
    rows.foreach { case (id, dv, nd, nf, fam) =>
      val (edv, end, enf) = expected(id)
      assert(dv == edv && nd == end && nf == enf, s"doc $id")
      assert(fam >= 1)
    }
    // family sizes are consistent: every doc in a family reports the family's size
    rows.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._5).distinct.length == 1)
      assert(members.head._5 == members.length)
    }
  }

  test("q_event_transitions: counts match brute force; probability rows normalize") {
    import spark.implicits._
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tu"), col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val expected = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._4)).map(_._2)
      sorted.zip(sorted.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Registry.byName("q_event_transitions").build(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(got.map { case (k, (n, _)) => k -> n }.toMap == expected)
    got.groupBy(_._1._1).foreach { case (from, rows) =>
      val psum = rows.map(_._2._2).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$from: probabilities sum to $psum")
    }
  }

  test("q_session_paths: top paths match a sessionized brute force") {
    import spark.implicits._
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tu"), col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val gap = 1800000000L
    val paths = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._4))
      val sessions = sorted.foldLeft(List.empty[List[(Long, String, Long, Long)]]) {
        case (acc, e) => acc match {
          case h :: t if e._3 - h.head._3 <= gap => (e :: h) :: t
          case _ => List(e) :: acc
        }
      }
      sessions.flatMap(s0 => s0.reverse.map(_._2).sliding(3).filter(_.size == 3)
        .map(_.mkString(">")))
    }
    val counts = paths.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expectedTop = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Registry.byName("q_session_paths").build(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    assert(got.map(r => (r._1, r._2)).toSeq == expectedTop)
  }

  test("q_daily_anomaly: z-scores recompute from the day counts") {
    val rows = Registry.byName("q_daily_anomaly").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val m = rows.length.toDouble
    val mean = rows.map(_._2).sum / m
    val varp = rows.map(r => r._2 * r._2).sum / m - mean * mean
    rows.foreach { case (_, n, z) =>
      val want = (n - mean) / math.sqrt(varp)
      assert(math.abs(z - want) < 1e-5)
    }
  }

  test("t_graph_degree_assort: heads match brute force; correlation bounded") {
    val row = Registry.byName("t_graph_degree_assort").build(spark, sf).collect().head
    val (nNodes, nEdges, maxDeg, assort) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    // recompute the graph exactly as the triangle test does
    val dg = docTokensRaw().flatMap { case (id, ws) =>
      shingles(ws, 3).distinct.map(g => (id, g))
    }
    val df = dg.groupBy(_._2).view.mapValues(_.length).toMap
    val edges = dg.filter { case (_, g) => df(g) >= 2 && df(g) <= 4 }
      .groupBy(_._2).values.flatMap { members =>
        val ids = members.map(_._1).distinct.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
      }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(nNodes == deg.size && nEdges == edges.size && maxDeg == deg.values.max)
    assert(assort >= -1.000001 && assort <= 1.000001)
  }

  test("e_jl_project: norm ratios honor the JL contract in aggregate") {
    val rows = Registry.byName("e_jl_project").build(spark, sf)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (orig, proj, ratio) =>
      assert(orig > 0 && proj >= 0 && ratio >= 0)
      assert(math.abs(ratio - proj / orig) < 1e-4)
    }
    // E[ratio²] = 1 with k=16 planes: the corpus mean must land well inside
    // the concentration band even at the small test SF
    val meanSq = rows.map(r => r._3 * r._3).sum / rows.length
    assert(meanSq > 0.5 && meanSq < 1.5, s"mean squared ratio $meanSq")
  }

  /** Non-lowered tokens — the shingle convention the graph entries use. */
  private def docTokensRaw(): Array[(Long, Array[String])] = {
    import spark.implicits._
    graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .as[(Long, Array[String])].collect()
  }

  test("q_rfm_segments: quintiles are balanced and the score recombines") {
    val rows = Registry.byName("q_rfm_segments").build(spark, sf)
      .collect().map(r => (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    Seq[Int](0, 1, 2).foreach { qi =>
      val sizes = rows.groupBy(r => qi match {
        case 0 => r._1; case 1 => r._2; case _ => r._3
      }).view.mapValues(_.size).toMap
      assert(sizes.keySet == (1L to 5L).toSet)
      assert(sizes.values.max - sizes.values.min <= 1, s"quintile $qi: $sizes")
    }
    rows.foreach { case (r, f, m, score) => assert(score == r * 100 + f * 10 + m) }
  }

  test("q7_nation_volume: no same-nation pairs, years bounded, revenue positive") {
    val rows = Registry.byName("q7_nation_volume").build(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (sn, cn, y, rev) =>
      assert(sn != cn)
      assert(y == 1996L || y == 1997L)
      assert(rev > 0)
    }
  }

  test("t_token_entropy: exact brute-force replay") {
    val toks = docTokens()
    val expected = toks.filter(_._2.nonEmpty).map { case (id, ws) =>
      val n = ws.length.toDouble
      val counts = ws.groupBy(identity).values.map(_.length)
      val hfx = counts.map { c =>
        math.floor(-(c / n) * math.log(c / n) * 1e9).toLong
      }.sum
      val h = hfx / 1e9
      val types = counts.size
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      id -> ((types.toLong, ws.length.toLong, r6(h),
        if (types == 1) 0.0 else r6(h / math.log(types.toDouble))))
    }.toMap
    val got = Registry.byName("t_token_entropy").build(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expected)
  }

  test("e_silhouette: covers the corpus, means bounded") {
    val rows = Registry.byName("e_silhouette").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == graft.Tables.load(spark, sf, "embeddings").count())
    rows.foreach { case (_, n, s) =>
      assert(n > 0)
      assert(s >= -1.000001 && s <= 1.000001)
    }
  }

  test("t_ks_drift: exact brute-force replay of the supremum") {
    val lens = docTokens().map { case (id, ws) => (id, ws.length.toLong) }
    val a = lens.filter(_._1 % 2 == 0).map(_._2)
    val b = lens.filter(_._1 % 2 == 1).map(_._2)
    val xs = (a ++ b).distinct.sorted
    val na = a.length.toLong; val nb = b.length.toLong
    val sup = xs.map { x =>
      val cuma = a.count(_ <= x).toLong; val cumb = b.count(_ <= x).toLong
      (x, math.abs(cuma * nb - cumb * na))
    }
    val mx = sup.map(_._2).max
    val dAt = sup.filter(_._2 == mx).map(_._1).min
    val row = Registry.byName("t_ks_drift").build(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((na, nb, dAt)))
    val want = math.floor(mx.toDouble / (na.toDouble * nb.toDouble) * 1e6 + 0.5) / 1e6
    assert(row.getDouble(3) == want)
  }

  test("q4_order_priority: semi-join counts each late order exactly once (brute force)") {
    import spark.implicits._
    val orders = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(o_orderdate)").as("od"))
      .as[(Long, String, Long)].collect()
      .filter(o => o._3 >= 836179200000000L && o._3 < 844128000000000L) // [1996-07-01, 1996-10-01)
    val ship = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), expr("unix_micros(l_shipdate)").as("sd"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val dl = 90L * 86400000000L
    val expected = orders
      .filter(o => ship.getOrElse(o._1, Array.empty).exists(_._2 > o._3 + dl))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = Registry.byName("q4_order_priority").build(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
    // semi-join, not inner: a fan-out would overcount multi-late-line orders
    val plan = Registry.byName("q4_order_priority").build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"q4 must plan a semi join:\n$plan")
  }

  test("q15_top_supplier: every returned row carries the global max revenue") {
    val rows = Registry.byName("q15_top_supplier").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).distinct.length == 1)
  }

  test("e_pq_distortion: every vector carries all subspaces, errors non-negative") {
    val rows = Registry.byName("e_pq_distortion").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == graft.Tables.load(spark, sf, "embeddings").count())
    rows.foreach { case (_, nSub, d) =>
      assert(nSub == 8)
      assert(d >= 0.0)
    }
  }
}
