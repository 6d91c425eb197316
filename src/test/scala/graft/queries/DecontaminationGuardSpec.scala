package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** The eval-side broadcast in decontamination is an assumption ("benchmarks
  * are small"), not an invariant — the guard must detect an oversized eval
  * dictionary and fall back to a shuffle join WITHOUT changing results. */
class DecontaminationGuardSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the join strategy
    df.queryExecution.executedPlan.toString
  }

  test("both paths agree on synthetic frames; plans actually diverge") {
    val trainG = Seq((1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"), (3L, "c"), (4L, "z"))
      .toDF("doc_id", "g")
    val evalG = Seq("b", "c").toDF("g")
    val viaBroadcast = TextQueries.contaminationCounts(trainG, evalG, Long.MaxValue)
    val viaShuffle = TextQueries.contaminationCounts(trainG, evalG, 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap
    assert(rows(viaBroadcast) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    assert(rows(viaShuffle) === rows(viaBroadcast),
      "fallback path must be semantics-identical")
    assert(planOf(viaBroadcast).contains("BroadcastHashJoin"),
      "small eval must broadcast")
    val shufflePlan = planOf(viaShuffle)
    assert(!shufflePlan.contains("BroadcastHashJoin") &&
      shufflePlan.contains("ShuffledHashJoin"),
      s"oversized eval must shuffle-join, got:\n${shufflePlan.take(600)}")
  }

  test("registry-shaped frames: forced fallback reproduces the oracle-checked result") {
    val d = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    val evalG = d.filter(col("doc_id") % 20 === 0)
      .select(explode(array_distinct(
        graft.functions.TextFunctions.shingles(col("text"), 4))).as("g")).distinct()
    val trainG = d.filter(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextFunctions.shingles(col("text"), 4))).as("g"))
    val normal = TextQueries.contaminationCounts(trainG, evalG)
      .as[(Long, Long)].collect().toMap
    val forced = TextQueries.contaminationCounts(trainG, evalG, 1L)
      .as[(Long, Long)].collect().toMap
    assert(normal.nonEmpty, "the decontamination check must not be vacuous")
    assert(forced === normal)
  }
}
