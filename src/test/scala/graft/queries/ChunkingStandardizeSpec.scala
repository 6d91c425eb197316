package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** Semantics the byte oracle can't see for the r8 chunking/standardization
  * queries: chunks actually tile the document (reassembly + overlap
  * properties), and the per-dim moments match an independent driver-side
  * computation (mean/std really are the corpus mean/std). */
class ChunkingStandardizeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val sfDir = GraftTestSpark.sfDir

  test("chunks tile the document: stride-prefix reassembly and overlap") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val chunks = Registry.byName("t_chunking").build(spark, sfDir)
      .select(col("doc_id"), col("chunk_id"), col("start"),
        col("chunk_len"), col("chunk_head"))
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (id, cs) =>
      val text = docs(id)
      // starts are 0, 300, 600, ... covering the text
      assert(cs.map(_._3) === cs.indices.map(_ * 300L))
      assert(cs.last._3 < math.max(text.length, 1),
        s"doc $id: a chunk starts past the text")
      cs.foreach { case (_, _, start, len, head) =>
        val expected = text.substring(start.toInt,
          math.min(start.toInt + 400, text.length))
        assert(len === expected.length.toLong, s"doc $id start $start length")
        assert(head === expected.take(16), s"doc $id start $start head")
      }
      // full coverage: last chunk reaches the end of the text
      val (_, _, lastStart, lastLen, _) = cs.last
      assert(lastStart + lastLen === math.max(text.length, 0).toLong ||
        (text.isEmpty && lastLen === 0L))
    }
  }

  test("standardization stats equal an independent driver-side computation") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding")).as[Seq[Float]].collect()
    val dim = emb.head.length
    val got = Registry.byName("e_standardize").build(spark, sfDir)
      .select(col("pos"), col("mu"), col("sigma"))
      .distinct().as[(Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    (0 until dim).foreach { d =>
      val xs = emb.map(_(d).toDouble)
      val mu = xs.sum / xs.length
      val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.length)
      val (gm, gs) = got(d.toLong)
      // the engine quantizes moments to a 1e-9 grid and rounds to 6 dp —
      // agreement to ~1e-5 pins the semantics without demanding the exact
      // float fold order of the driver-side reference
      assert(math.abs(gm - mu) < 1e-5, s"dim $d mean: $gm vs $mu")
      assert(math.abs(gs - sigma) < 1e-5, s"dim $d std: $gs vs $sigma")
    }
  }
}
