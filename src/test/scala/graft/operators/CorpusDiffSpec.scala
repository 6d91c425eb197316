package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** Semantics of the content-addressed snapshot diff the byte oracle can't
  * see: status assignment per constructed case, delta-sized output
  * (unchanged emits nothing), and the identical-snapshot fixpoint. */
class CorpusDiffSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("constructed cases: added / removed / changed / unchanged") {
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val cur = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val out = CorpusDiff.diff(prev, cur, "doc_id", "text")
      .select(col("doc_id"), col("status")).as[(Long, String)].collect().toMap
    assert(out === Map(2L -> "changed", 3L -> "removed", 4L -> "added"),
      "unchanged id 1 must emit nothing")
    val stats = CorpusDiff.diffStats(prev, cur, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(stats === Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L))
  }

  test("null texts: null-in-both is unchanged, null-vs-text is changed") {
    val prev = Seq((1L, null: String), (2L, "b"), (3L, null: String))
      .toDF("doc_id", "text")
    val cur = Seq((1L, null: String), (2L, null: String), (3L, "now set"))
      .toDF("doc_id", "text")
    val out = CorpusDiff.diff(prev, cur, "doc_id", "text")
      .select(col("doc_id"), col("status")).as[(Long, String)].collect().toMap
    assert(out === Map(2L -> "changed", 3L -> "changed"),
      "id 1 (null in both snapshots) must emit nothing")
  }

  test("identical snapshots diff to empty") {
    val d = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    assert(CorpusDiff.diff(d, d, "doc_id", "text").isEmpty)
  }

  test("fingerprint sides: nulls exactly on the absent side") {
    val prev = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val cur = Seq((2L, "b2"), (3L, "c")).toDF("doc_id", "text")
    val rows = CorpusDiff.diff(prev, cur, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.isNullAt(2), r.isNullAt(3))).toSet
    assert(rows === Set(
      (1L, "removed", false, true),
      (2L, "changed", false, false),
      (3L, "added", true, false)))
  }
}
