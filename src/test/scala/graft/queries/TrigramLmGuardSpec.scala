package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** The trigram-LM model broadcast rides the "alphabet-bounded" assumption —
  * true for ASCII, false for a multilingual/CJK corpus where distinct
  * char-trigrams reach 10⁸⁺. The guard must detect an oversized model and
  * fall back to a shuffled hash join WITHOUT changing results. */
class TrigramLmGuardSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the join strategy
    df.queryExecution.executedPlan.toString
  }

  test("huge-alphabet corpus: fallback engages and agrees with the broadcast path") {
    // Synthetic "huge alphabet": every doc is a distinct codepoint run, so
    // nearly every trigram in the corpus is unique — the model is
    // corpus-sized, exactly the multilingual failure mode the cap guards.
    val docs = (0 until 200).map { i =>
      val base = 0x4e00 + i * 37 // CJK-block codepoints, disjoint runs
      (i.toLong, (0 until 12).map(j => (base + j).toChar).mkString)
    }.toDF("doc_id", "t")
    val viaBroadcast = TextQueries.trigramFamiliarity(docs, Long.MaxValue)
    val viaShuffle = TextQueries.trigramFamiliarity(docs, 16L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    assert(rows(viaBroadcast).nonEmpty)
    assert(rows(viaShuffle) === rows(viaBroadcast),
      "fallback path must be semantics-identical")
    assert(planOf(viaBroadcast).contains("BroadcastHashJoin"),
      "in-cap model must broadcast")
    val shufflePlan = planOf(viaShuffle)
    assert(!shufflePlan.contains("BroadcastHashJoin") &&
      shufflePlan.contains("ShuffledHashJoin"),
      s"oversized model must shuffle-join, got:\n${shufflePlan.take(600)}")
  }

  test("registry-shaped corpus: forced fallback reproduces the oracle-checked result") {
    val d = Tables.load(spark, GraftTestSpark.sfDir, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 3)
    val normal = TextQueries.trigramFamiliarity(d)
      .as[(Long, Long, Long)].collect().toSet
    val forced = TextQueries.trigramFamiliarity(d, 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(normal.nonEmpty)
    assert(forced === normal)
  }
}
