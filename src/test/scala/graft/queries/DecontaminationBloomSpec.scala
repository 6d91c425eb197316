package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** The Bloom prefilter in t_decontaminate_bloom must be pure plumbing:
  * identical results to the plain contamination join on every guard path
  * (its false positives die in the exact join, false negatives can't exist),
  * while actually discarding most of the train-side grams before any join
  * work — that pre-shuffle discard is its entire reason to exist. */
class DecontaminationBloomSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def grams() = {
    val d = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    val evalG = d.filter(col("doc_id") % 20 === 0)
      .select(explode(array_distinct(
        graft.functions.TextFunctions.shingles(col("text"), 4))).as("g")).distinct()
    val trainG = d.filter(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextFunctions.shingles(col("text"), 4))).as("g"))
    (trainG, evalG)
  }

  test("prefiltered result ≡ plain result on both guard paths") {
    val (trainG, evalG) = grams()
    val pre = TextQueries.bloomPrefilter(trainG, evalG)
    def rows(df: org.apache.spark.sql.DataFrame) = df.as[(Long, Long)].collect().toMap
    val plain = rows(TextQueries.contaminationCounts(trainG, evalG))
    assert(plain.nonEmpty, "must not be vacuous")
    assert(rows(TextQueries.contaminationCounts(pre, evalG)) === plain)
    // large-eval regime: broadcast guard trips, exact join shuffles — the
    // prefilter's actual deployment scenario
    assert(rows(TextQueries.contaminationCounts(pre, evalG, 1L)) === plain)
  }

  test("the prune bites: most train grams never reach the join") {
    val (trainG, evalG) = grams()
    val total = trainG.count()
    val kept = TextQueries.bloomPrefilter(trainG, evalG).count()
    assert(kept.toDouble / total < 0.5,
      s"prefilter kept $kept of $total train grams — the 2^16-bucket set " +
        "should discard the non-matching majority on this corpus")
  }

  test("collision-heavy filter (4 buckets) still exact — false positives die downstream") {
    val (trainG, evalG) = grams()
    def rows(df: org.apache.spark.sql.DataFrame) = df.as[(Long, Long)].collect().toMap
    val pre = TextQueries.bloomPrefilter(trainG, evalG, bits = 2)
    // nearly everything collides into the 4 buckets → almost no pruning,
    // but the output contract must hold regardless of filter width
    assert(rows(TextQueries.contaminationCounts(pre, evalG)) ===
      rows(TextQueries.contaminationCounts(trainG, evalG)))
  }
}
