package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** DSIR estimator semantics on constructed corpora with known domain
  * separation — the oracle checks byte equality; this pins the BEHAVIOR
  * (target-like docs outrank raw-like docs, smoothing keeps unseen
  * buckets finite, determinism under repartition). */
class DsirWeightsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  // Two cleanly separated vocabularies; mixed docs interpolate.
  private val targetText = "science theory experiment hypothesis analysis " +
    "measurement observation result conclusion evidence"
  private val rawText = "click buy cheap deal offer discount sale price " +
    "shop order"

  private def corpus = Seq(
    (1L, targetText, true),
    (2L, targetText.split(" ").reverse.mkString(" "), true),
    (3L, rawText, false),
    (4L, rawText.split(" ").reverse.mkString(" "), false),
    // held-out docs to score: pure target-like, mixed, pure raw-like
    (10L, targetText, false),
    (11L, targetText.split(" ").take(5).mkString(" ") + " " +
      rawText.split(" ").take(5).mkString(" "), false),
    (12L, rawText, false)
  ).toDF("doc_id", "text", "is_target")

  test("target-like documents outrank mixed outrank raw-like") {
    val w = DsirWeights.logImportanceWeights(
        corpus, "doc_id", "text", col("is_target"), buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(10L) > w(11L), s"pure target ${w(10L)} must beat mixed ${w(11L)}")
    assert(w(11L) > w(12L), s"mixed ${w(11L)} must beat pure raw ${w(12L)}")
    assert(w(10L) > 0.0 && w(12L) < 0.0,
      s"signs must separate the domains: ${w(10L)} / ${w(12L)}")
  }

  test("every document with grams is scored; weights are finite") {
    val out = DsirWeights.logImportanceWeights(
      corpus, "doc_id", "text", col("is_target"), buckets = 256).collect()
    assert(out.length === 7)
    out.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
      assert(r.getLong(1) > 0L)
    }
  }

  test("n_grams counts uni+bigrams") {
    val out = DsirWeights.logImportanceWeights(
        Seq((1L, "a b c", true), (2L, "solo", false)).toDF("doc_id", "text", "t"),
        "doc_id", "text", col("t"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 5L) // 3 unigrams + 2 bigrams
    assert(out(2L) === 1L) // 1 unigram, no bigram
  }

  test("deterministic under repartition (integer cross-row sums)") {
    val a = DsirWeights.logImportanceWeights(
        corpus, "doc_id", "text", col("is_target"), buckets = 256)
      .orderBy("doc_id").collect().toSeq
    val b = DsirWeights.logImportanceWeights(
        corpus.repartition(7), "doc_id", "text", col("is_target"), buckets = 256)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("sf corpus: English docs score higher than non-English on average") {
    val docs = graft.Tables.load(spark, GraftTestSpark.sfDir, "documents")
    val w = DsirWeights.logImportanceWeights(
        docs, "doc_id", "text", col("lang") === "en", buckets = 1024)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val avg = w.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg(col("logw")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
      s"en mean ${avg(true)} must exceed non-en mean ${avg(false)}")
  }
}
