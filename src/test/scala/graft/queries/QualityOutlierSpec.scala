package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Semantic pins for the r9 audit/filter operators: containment catches the
  * subset-duplication Jaccard misses, the linear quality classifier responds
  * to its features in the documented direction, and the outlier audit emits
  * the per-cell distance maxima. (Byte-for-byte values are pinned by the
  * DuckDB oracle gate; these assert the INVARIANTS.)
  */
class QualityOutlierSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def run(name: String, dir: String = GraftTestSpark.sfDir) =
    Registry.byName(name).build(spark, dir)

  /** A scratch sf-dir holding just a documents table. */
  private def corpusDir(docs: Seq[(Long, String)]): String = {
    val dir = GraftTestSpark.tmpDir("qo-corpus")
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("containment flags a doc quoted whole inside a larger one; jaccard does not") {
    val para = (1 to 12).map(i => s"quoted sentence $i about topic").mkString(" ")
    val filler = (1 to 120).map(i => s"unrelated filler line $i goes here").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, para),                 // the short doc
      (2L, s"$filler $para"),     // contains doc 1 verbatim
      (3L, "completely different text with nothing shared at all")))
    val cont = run("t_containment_pairs", dir).collect()
    val hit = cont.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(hit.isDefined, "subset pair (1,2) must be flagged")
    assert(hit.get.getDouble(3) == 1.0, "doc 1 is fully contained in doc 2")
    // the same pair sits BELOW the jaccard mining threshold — the case
    // the symmetric measure cannot see
    val jac = run("t_jaccard_pairs", dir).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "jaccard (>= 0.4 gate) must miss the 10:1 subset pair")
  }

  test("containment output is bounded and well-formed on the sf corpus") {
    val rows = run("t_containment_pairs").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "canonical a_id < b_id")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(math.max(r.getDouble(3), r.getDouble(4)) >= 0.9)
    }
  }

  test("quality classifier responds to features in the documented direction") {
    val stopRich = "the cat sat on the mat and it was happy for a while in the sun " * 4
    val junk = "zqxj zqxj zqxj zqxj zqxj zqxj zqxj zqxj zqxj zqxj !!!!!! ;;;;;; ??????"
    val dir = corpusDir(Seq((1L, stopRich), (2L, junk)))
    val byId = run("t_quality_classifier", dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(byId(1L)._1 > byId(2L)._1, "stopword-rich prose must outscore repeated junk")
    byId.values.foreach { case (logit, keep) => assert(keep == (logit >= 0)) }
  }

  test("outlier audit: 2 rows per cell, rank-ordered, max-distance z never negative") {
    val rows = run("e_outliers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val byCell = rows.groupBy(_._1)
    assert(rows.length == byCell.size * 2, "exactly top-2 per populated cell")
    byCell.values.foreach { cell =>
      val Seq(first, second) = cell.sortBy(_._2).toSeq
      assert(first._2 == 1L && second._2 == 2L)
      assert(first._4 >= second._4, "rnk 1 is the farthest vector")
      // the max distance is >= the cell mean by definition, so its z >= 0
      assert(first._5 >= 0.0)
    }
    // emitted vectors really belong to the cell they are reported in
    val asg = graft.similarity.SemDedup.assignCells(
        graft.Tables.load(spark, GraftTestSpark.sfDir, "embeddings"),
        "vec_id", "embedding", nCells = 16)
      .select("vec_id", "cell_id").as[(Long, Long)].collect().toMap
    rows.foreach { case (cell, _, vec, _, _) => assert(asg(vec) == cell) }
  }
}
