package graft.retrieval

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** Public query-time text knn ([[TextSearch.knn]]): arbitrary query
  * frames against an independent in-memory brute-force reference (plain
  * Scala collections — no Spark, no shared code path), plus the
  * guarded-broadcast equality and the excludeSelf contract. The pinned
  * registry slice (t_text_knn) rides the DuckDB oracle; this spec is the
  * evidence for query frames the registry cannot pin.
  */
class TextSearchSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val K = 3
  private val MaxDf = 5 // low cap so the hot-shingle guard actually fires

  private lazy val corpusRows: Seq[(Long, String)] =
    Tables.load(spark, GraftTestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(60)
      .as[(Long, String)].collect().toSeq

  private lazy val corpus = corpusRows.toDF("doc_id", "text")

  // queries deliberately OUTSIDE the corpus id space: mutated corpus texts
  private lazy val queryRows: Seq[(Long, String)] = corpusRows.take(4)
    .map { case (id, t) => (id + 7000L, t + " zz_tail_token zz_tail_token2") }
  private lazy val queries = queryRows.toDF("query_id", "text")

  /** Plain-Scala reference: word-k-shingles, corpus-df cap, exact
    * jaccard, top-k by (jaccard desc, cand_id asc). */
  private def reference(qs: Seq[(Long, String)],
      excludeSelf: Boolean): Set[(Long, Long, Double, Long)] = {
    def sh(t: String): Set[String] = {
      val ws = t.trim.split("\\s+").toSeq
      ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val cs = corpusRows.map { case (id, t) => id -> sh(t) }
    val hot = cs.flatMap(_._2).groupBy(identity)
      .collect { case (s, occ) if occ.size > MaxDf => s }.toSet
    val csc = cs.map { case (id, s) => id -> (s -- hot) }
    def round6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    qs.flatMap { case (qid, qt) =>
      val qs0 = sh(qt) -- hot
      val scored = csc
        .filter { case (cid, _) => !(excludeSelf && cid == qid) }
        .map { case (cid, cset) =>
          val inter = (qs0 & cset).size
          (cid, inter, round6(inter.toDouble / (qs0.size + cset.size - inter)))
        }
        .filter(_._2 > 0) // no shared shingle → no candidate row
        .sortBy { case (cid, _, j) => (-j, cid) }
        .take(K).zipWithIndex
      scored.map { case ((cid, _, j), i) => (qid, cid, j, (i + 1).toLong) }
    }.toSet
  }

  private def api(qs: org.apache.spark.sql.DataFrame, excludeSelf: Boolean,
      cap: Long = 2000000L): Set[(Long, Long, Double, Long)] =
    TextSearch.knn(qs, corpus, K, maxDf = MaxDf, excludeSelf = excludeSelf,
        maxBroadcastShingles = cap)
      .as[(Long, Long, Double, Long)].collect().toSet

  test("arbitrary external query frame matches the brute-force reference") {
    val got = api(queries, excludeSelf = false)
    assert(got.nonEmpty)
    assert(got === reference(queryRows, excludeSelf = false))
  }

  test("shuffle fallback (guard cap 0) scores identically to broadcast") {
    assert(api(queries, excludeSelf = false, cap = 0L) ===
      api(queries, excludeSelf = false))
  }

  test("excludeSelf drops exactly the identical-id candidate") {
    // queries that ARE corpus docs, sharing the corpus id space
    val inCorpus = corpusRows.take(4).toDF("query_id", "text")
    val withSelf = api(inCorpus, excludeSelf = false)
    val noSelf = api(inCorpus, excludeSelf = true)
    // self match is jaccard 1.0 at rank 1 on the withSelf path
    corpusRows.take(4).foreach { case (id, _) =>
      assert(withSelf.contains((id, id, 1.0, 1L)), s"doc $id should self-match at rank 1")
    }
    assert(noSelf.forall { case (q, c, _, _) => q != c })
    assert(noSelf === reference(corpusRows.take(4), excludeSelf = true))
  }

  test("k bounds the per-query answer and ranks are dense from 1") {
    val got = api(queries, excludeSelf = false).groupBy(_._1)
    got.foreach { case (_, rows) =>
      assert(rows.size <= K)
      assert(rows.map(_._4).toSeq.sorted === (1L to rows.size.toLong))
    }
  }
}
