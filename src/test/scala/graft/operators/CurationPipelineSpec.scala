package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}
import graft.dedup.TextDedup
import graft.functions.TextFunctions._

/** Composition contract of the end-to-end curation run — what the
  * byte-level oracle can't express: the audit covers every input doc
  * exactly once, each verdict really is the FIRST failing gate, and the
  * kept set is identical to running the stages by hand in sequence.
  */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, GraftTestSpark.sfDir, "documents").cache()
  private lazy val audit = CurationPipeline.audit(docs, "doc_id", "text").cache()

  test("one verdict per input doc; split exactly on keepers") {
    assert(audit.count() === docs.count())
    assert(audit.select(countDistinct(col("doc_id"))).as[Long].first() === docs.count())
    val verdicts = audit.select("verdict").distinct().as[String].collect().toSet
    assert(verdicts.subsetOf(Set("kept", "quality", "lang", "exact_dup", "near_dup")))
    assert(audit.filter(col("verdict") === "kept" && col("split").isNull).count() === 0)
    assert(audit.filter(col("verdict") =!= "kept" && col("split").isNotNull).count() === 0)
  }

  test("kept set equals the hand-composed stage sequence") {
    val staged = docs.select(col("doc_id"), col("text"),
      tokens(lower(col("text"))).as("ws"))
    val s1 = withLangGuessFromTokens(
      staged.withColumn("q", qualityClassifierLogit(col("text"), col("ws")) >= 0),
      "ws", "lg")
      .filter(col("q") && col("lg") === "en").select("doc_id", "text")
    val minFp = s1.select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val s2 = s1.join(
      minFp.groupBy("fp").agg(min(col("doc_id")).as("kid")).select(col("kid").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val kept = TextDedup.minHashDedup(s2, "doc_id", "text",
        TextDedup.MinHashConfig(jaccardThreshold = 0.4, portable = true))
      .select("doc_id").as[Long].collect().toSet
    val got = audit.filter(col("verdict") === "kept").select("doc_id").as[Long].collect().toSet
    assert(got === kept)
  }

  test("each rejection verdict is the first failing gate") {
    val staged = docs.select(col("doc_id"), col("text"),
      tokens(lower(col("text"))).as("ws"))
    val gates = withLangGuessFromTokens(
      staged.withColumn("q", qualityClassifierLogit(col("text"), col("ws")) >= 0),
      "ws", "lg").select("doc_id", "q", "lg")
    val joined = audit.join(gates, "doc_id").cache()
    assert(joined.filter(col("verdict") === "quality" && col("q")).count() === 0)
    assert(joined.filter(col("verdict") === "lang" &&
      (!col("q") || col("lg") === "en")).count() === 0)
    // exact_dup docs passed both per-row gates and have a lower-id
    // survivor sharing their fingerprint
    val eds = joined.filter(col("verdict") === "exact_dup")
    assert(eds.filter(!col("q") || col("lg") =!= "en").count() === 0)
    val s1 = joined.filter(col("q") && col("lg") === "en")
      .join(docs, "doc_id").select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val edFp = eds.join(s1.as("me"), "doc_id")
      .select(col("doc_id").as("ed_id"), col("me.fp").as("ed_fp"))
    val witnesses = edFp.join(s1.as("other"),
      col("ed_fp") === col("other.fp") && col("other.doc_id") < col("ed_id"), "left_semi")
    assert(witnesses.count() === eds.count())
    joined.unpersist()
  }
}
