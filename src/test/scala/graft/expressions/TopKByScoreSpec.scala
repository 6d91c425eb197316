package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark
import graft.similarity.SimilaritySearch

/** The bounded-heap grouped top-k aggregate must be EXACTLY the window
  * `row_number() over (order by score desc, id)` contract, independent of
  * partitioning (partial aggregation merges must not change the answer).
  */
class TopKByScoreSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def randomScored(n: Int, keys: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // duplicate scores on purpose: the id tiebreak must decide
    (1 to n).map(i => (rnd.nextInt(keys).toLong, rnd.nextInt(50) / 10.0, i.toLong))
      .toDF("key", "score", "id")
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("key", "id", "score", "rnk")
  }

  test("matches window row_number exactly, including score ties") {
    val df = randomScored(5000, keys = 37, seed = 11)
    val expected = windowTopK(df, 5).as[(Long, Long, Double, Long)].collect().toSet
    val got = SimilaritySearch.topKPerKey(df, "key", "score", "id", 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got === expected)
  }

  test("partition-count invariant (partial merges don't change the answer)") {
    val df = randomScored(3000, keys = 7, seed = 23)
    val a = SimilaritySearch.topKPerKey(df.repartition(1), "key", "score", "id", 3)
      .as[(Long, Long, Double, Long)].collect().toSet
    val b = SimilaritySearch.topKPerKey(df.repartition(29), "key", "score", "id", 3)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(a === b)
  }

  test("groups smaller than k return all their rows, ranked") {
    val df = Seq((1L, 0.9, 10L), (1L, 0.8, 11L), (2L, 0.5, 20L)).toDF("key", "score", "id")
    val got = SimilaritySearch.topKPerKey(df, "key", "score", "id", 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got === Set((1L, 10L, 0.9, 1L), (1L, 11L, 0.8, 2L), (2L, 20L, 0.5, 1L)))
  }

  test("NaN scores rank greatest (Spark window ordering) and never wedge the heap") {
    val df = Seq(
      (1L, Double.NaN, 10L), (1L, 0.1, 11L), (1L, 0.9, 12L), (1L, 0.95, 13L)
    ).toDF("key", "score", "id")
    val got = SimilaritySearch.topKPerKey(df, "key", "score", "id", 2)
      .select("id", "rnk").as[(Long, Long)].collect().toSet
    val expected = windowTopK(df, 2).select("id", "rnk")
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got === Set((10L, 1L), (13L, 2L))) // NaN first, then 0.95
  }

  test("non-(double,bigint) inputs fail analysis, not executors") {
    val df = Seq((1L, 0.5f, 7)).toDF("key", "score", "id")
    val e = intercept[Exception] {
      SimilaritySearch.topKPerKey(df, "key", "score", "id", 2).collect()
    }
    assert(e.getMessage.toLowerCase.contains("topk_by_score")
      || e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
  }

  test("plan uses partial aggregation, not a window sort") {
    val df = randomScored(100, keys = 3, seed = 5)
    val plan = SimilaritySearch.topKPerKey(df, "key", "score", "id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window operator expected in:\n$plan")
    assert(plan.contains("partial_topkbyscore") || plan.toLowerCase.contains("partial"),
      s"partial aggregation expected in:\n$plan")
  }
}
