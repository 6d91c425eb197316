package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** Continuous right-to-be-forgotten: a forget-request stream fans each
  * micro-batch's ids to all three standing indexes' tombstone paths and
  * leaves an audit trail; suppression is immediate on every index and
  * replaying requests is a no-op (idempotent deletes). */
class DeletionStreamSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("deletion stream suppresses ids across all three indexes and audits each apply") {
    val base = GraftTestSpark.tmpDir("delstream")
    val docs = Tables.load(spark, GraftTestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val emb = Tables.load(spark, GraftTestSpark.sfDir, "embeddings")

    // standing indexes (doc ids and vec ids share the forget-request key
    // space in this deployment shape)
    val rdir = s"$base/rindex"; val tdir = s"$base/tindex"; val vdir = s"$base/vindex"
    graft.retrieval.RetrievalIndex.build(docs, "doc_id", "text", rdir)
    graft.dedup.TextDedupIndex.build(docs, "doc_id", "text", tdir)
    graft.similarity.IvfIndex.build(emb, "vec_id", "embedding", vdir,
      graft.similarity.IvfIndex.Config(nCentroids = 16, nProbe = 16))

    // two request batches, one file each (maxFilesPerTrigger = 1)
    val waveA = Seq(0L, 5L, 10L); val waveB = Seq(15L, 20L)
    waveA.toDF("id").coalesce(1).write.parquet(s"$base/feed/a")
    Thread.sleep(1100) // distinct mtimes: file order = arrival order
    waveB.toDF("id").coalesce(1).write.parquet(s"$base/feed/b")
    val doomed = (waveA ++ waveB).toSet

    val q = DeletionStream.run(
      spark.readStream.schema("id LONG")
        .option("maxFilesPerTrigger", "1").parquet(s"$base/feed/*"),
      DeletionStream.Targets(Some(rdir), Some(tdir), Some(vdir)),
      s"$base/audit", s"$base/ckpt", "id")
    try { q.awaitTermination(300000); if (q.isActive) q.stop() }
    finally { try q.stop() catch { case _: Throwable => () } }

    // retrieval: scored docs exclude every deleted id
    val scored = graft.retrieval.RetrievalIndex.scoreBm25(spark, rdir,
        graft.retrieval.RetrievalIndex.topTerms(spark, rdir, 3))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(scored.nonEmpty && doomed.forall(!scored(_)),
      "retrieval index must stop scoring deleted docs")

    // text dedup: probing with the doomed docs' own text finds no match
    // on them (their index rows are suppressed)
    val probes = docs.filter(col("doc_id").isin(doomed.toSeq: _*))
      .withColumn("doc_id", col("doc_id") + 5000000L)
    val matches = graft.dedup.TextDedupIndex.searchNew(
        probes, tdir, "doc_id", "text")
      .select(col("corpus_id")).as[Long].collect().toSet
    assert(doomed.forall(!matches(_)),
      "dedup index must stop matching deleted docs")

    // ivf: an exhaustive probe finds no deleted vector
    val found = graft.similarity.IvfIndex.searchIndex(
        emb.filter(col("vec_id") === 42), vdir, "vec_id", "embedding",
        1000, nProbe = 16)
      .select(col("cand_id")).as[Long].collect().toSet
    assert(found.nonEmpty && doomed.forall(!found(_)),
      "ANN index must stop returning deleted vectors")

    // audit: one row per (id, index) with the batch it rode in on
    val audit = spark.read.parquet(s"$base/audit")
    assert(audit.select(col("id"), col("index")).distinct().count()
      === (doomed.size * 3).toLong)
    assert(audit.select(col("index")).distinct().count() === 3L)
    assert(audit.select(col("batch_id")).distinct().count() >= 2L,
      "the two request files must arrive as separate batches")

    // replaying the same requests through a fresh stream is a no-op on
    // the indexes (idempotent tombstones) and only extends the audit
    val q2 = DeletionStream.run(
      spark.readStream.schema("id LONG").parquet(s"$base/feed/*"),
      DeletionStream.Targets(Some(rdir), Some(tdir), Some(vdir)),
      s"$base/audit", s"$base/ckpt2", "id")
    try { q2.awaitTermination(300000); if (q2.isActive) q2.stop() }
    finally { try q2.stop() catch { case _: Throwable => () } }
    val scored2 = graft.retrieval.RetrievalIndex.scoreBm25(spark, rdir,
        graft.retrieval.RetrievalIndex.topTerms(spark, rdir, 3))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(scored2 === scored, "re-deleting must not change the search image")
  }
}
