package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class WinnowSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val passage = "the incremental deduplication job reads its checkpoint " +
    "from the state table and repairs the affected day partitions"

  private val docs = Seq(
    (1L, s"intro text one $passage closing remarks alpha"),
    (2L, s"completely different framing here $passage and a different tail beta"),
    (3L, "unrelated content about vector search and hyperplane bands gamma delta " +
      "epsilon zeta eta theta iota kappa going on for a while without overlap")
  ).toDF("doc_id", "text")

  test("identical docs produce identical fingerprint sets") {
    val fps = TextDedup.winnowFingerprints(docs.union(docs), "doc_id", "text")
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getSeq[Long](1)).toSeq).toMap
    fps.values.foreach(v => assert(v.head === v.last))
  }

  test("docs sharing a long passage share fingerprints; unrelated docs don't") {
    val pairs = TextDedup.winnowOverlapPairs(docs, "doc_id", "text", minShared = 3)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("winnow-oracle precondition: the documents corpus is ASCII") {
    // The t_winnow/t_winnow_pairs DuckDB oracles replay the char-gram hash
    // with `unicode(ch)` (codepoints), which equals the kernel's UTF-16
    // `charAt` code units ONLY for BMP text — and DuckDB's lower() can
    // disagree with Java's outside ASCII. The oracle comment assumes an
    // ASCII corpus; this spec ENFORCES it (ADVICE r5): if the generator
    // ever emits non-ASCII documents, this fails and those oracles must be
    // demoted to rows-only.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val offenders = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
        .as[(Long, String)].collect()
        .filter { case (_, t) => t.exists(_ >= 0x80) }
      assert(offenders.isEmpty,
        s"non-ASCII document text in $dir breaks the winnow oracle's " +
          s"code-unit assumption: ids ${offenders.take(5).map(_._1).mkString(",")}")
    }
  }

  test("fingerprints are deterministic, sorted, distinct, and short text-safe") {
    val fps = TextDedup.winnowFingerprints(docs, "doc_id", "text")
      .filter(col("doc_id") === 1).first().getSeq[Long](1)
    assert(fps === fps.sorted)
    assert(fps.distinct.size === fps.size)
    val tiny = Seq((9L, "ab")).toDF("doc_id", "text") // shorter than k
    assert(TextDedup.winnowFingerprints(tiny, "doc_id", "text")
      .first().getSeq[Long](1).isEmpty)
  }
}
