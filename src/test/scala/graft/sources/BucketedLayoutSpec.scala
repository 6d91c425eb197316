package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** The point of bucketing is plan shape, so the spec asserts PLANS: a
  * bucketed⋈bucketed equi-join must carry zero shuffle exchanges (the
  * layout pre-paid them) and a bucket-key aggregation must run
  * exchange-free — while producing byte-identical results to the plain
  * parquet plans that do shuffle. */
class BucketedLayoutSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def shuffles(df: DataFrame): Int = {
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
  }

  private def docs = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    .select(col("doc_id"), col("source"), col("n_chars"))

  private def stats = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    .select(col("doc_id"), length(col("text")).cast("long").as("len"))

  test("bucketed join: zero shuffles, same rows as the shuffling plan") {
    val base = GraftTestSpark.tmpDir("graft-bucket")
    BucketedLayout.writeBucketed(docs, "bl_docs", s"$base/docs",
      Seq("doc_id"), nBuckets = 4, sortCols = Seq("doc_id"))
    BucketedLayout.writeBucketed(stats, "bl_stats", s"$base/stats",
      Seq("doc_id"), nBuckets = 4, sortCols = Seq("doc_id"))
    val bucketed = BucketedLayout.read(spark, "bl_docs").hint("merge")
      .join(BucketedLayout.read(spark, "bl_stats"), "doc_id")
    val plain = docs.hint("merge").join(stats, "doc_id")
    assert(shuffles(bucketed) === 0,
      "bucketed sides must satisfy the join's distribution with no exchange")
    assert(shuffles(plain) >= 2, "the plain plan must be shuffling both sides")
    val a = bucketed.orderBy("doc_id").collect().map(_.toSeq)
    val b = plain.orderBy("doc_id").collect().map(_.toSeq)
    assert(a === b)
  }

  test("bucket-key aggregation runs exchange-free") {
    val agg = BucketedLayout.read(spark, "bl_docs")
      .groupBy("doc_id").agg(sum("n_chars").as("s"))
    assert(shuffles(agg) === 0)
    // non-bucket-key aggregation still shuffles (the layout is key-specific)
    val off = BucketedLayout.read(spark, "bl_docs")
      .groupBy("source").agg(count(lit(1)))
    assert(shuffles(off) === 1)
  }

  test("results survive re-read through the files + catalog registration") {
    val n = BucketedLayout.read(spark, "bl_docs").count()
    assert(n === docs.count())
  }

  test("loud contracts") {
    intercept[IllegalArgumentException] {
      BucketedLayout.writeBucketed(docs, "bl_bad", "/tmp/x", Nil, 4)
    }
    intercept[IllegalArgumentException] {
      BucketedLayout.writeBucketed(docs, "bl_bad", "/tmp/x", Seq("doc_id"), 0)
    }
  }
}
