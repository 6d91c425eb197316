package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Semantics of SpanDedup independently of the DuckDB oracle: constructed
  * corpora with KNOWN planted spans, checked against hand-computed
  * intervals and surgical outputs. */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  // Distinct filler that shares no 30-gram across docs (doc-id salted).
  private def filler(tag: String, n: Int): String =
    (1 to n).map(i => f"$tag$i%03d").mkString(" ").take(n)

  private val block = "THE-SHARED-LICENSE-HEADER-BLOCK-REPEATED-VERBATIM-" +
    "ACROSS-DOCUMENTS-0123456789-ABCDEFGHIJKLMNOPQRSTUVWXYZ" // 104 chars

  test("duplicated spans: a shared block at different offsets is found exactly") {
    val a = filler("aqz", 57) + block + filler("bxq", 41)
    val b = filler("cwy", 13) + block + filler("dvt", 99)
    val c = filler("eus", 120) // clean doc
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // Every 30-gram inside the 104-char block (positions blockStart ..
    // blockStart+74) is duplicated; the island merge must return ONE span
    // covering exactly the block in each carrier, none in the clean doc.
    assert(spans === Array((1L, 58L, 104L), (2L, 14L, 104L)))
  }

  test("within-doc repetition marks every occurrence and adjacent islands merge") {
    val unit = "SELF-REPEATED-UNIT-OF-FORTY-CHARS-X01234" // 40 chars
    assert(unit.length === 40)
    // unit twice back-to-back: all 30-grams of unit*2 except none... the
    // doubled region's grams at offsets 1..51 include cross-boundary grams
    // that occur once — but grams at 1..11 equal grams at 41..51, so both
    // copies mark, islands touch, and ONE merged span must cover [1, 81).
    val doc = unit + unit + filler("kqj", 50)
    val docs = Seq((7L, doc)).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 30)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.length === 1)
    val (start, len) = spans.head
    assert(start === 1L)
    assert(len >= 70L && len <= 80L) // both copies covered, filler untouched
  }

  test("surgery: symmetric removal, length invariant, pass-through docs") {
    val a = filler("aqz", 57) + block + filler("bxq", 41)
    val b = filler("cwy", 13) + block + filler("dvt", 99)
    val c = filler("eus", 120)
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, "short"), (5L, null))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", k = 30)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((Some(filler("aqz", 57) + filler("bxq", 41)), 1L, 104L)))
    assert(out(2L) === ((Some(filler("cwy", 13) + filler("dvt", 99)), 1L, 104L)))
    assert(out(3L) === ((Some(c), 0L, 0L))) // clean doc passes through
    assert(out(4L) === ((Some("short"), 0L, 0L))) // below k passes through
    assert(out(5L) === ((None, 0L, 0L))) // null text stays null
  }

  test("surgery: a doc that is entirely duplicated cleans to the empty string") {
    val docs = Seq((1L, block), (2L, block)).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", k = 30)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("", 1L, 104L), ("", 1L, 104L)))
  }

  test("anchored spans are contained in stride-1 spans; long spans are caught") {
    val a = filler("aqz", 57) + block + block + filler("bxq", 41) // 208-char dup
    val b = filler("cwy", 13) + block + block + filler("dvt", 99)
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val full = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val anch = SpanDedup
      .duplicatedSpans(docs, "doc_id", "text", k = 30, anchorStride = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // A 208-char duplicated region holds ~179 anchor candidates — at
    // stride 8 detection is morally certain and, given the fixed hash,
    // deterministic: assert it actually fired for both docs.
    assert(anch.map(_._1).toSet === Set(1L, 2L))
    // Containment: every anchored span sits inside a stride-1 span of the
    // same doc (anchor positions are a subset of all positions).
    anch.foreach { case (id, s, l) =>
      assert(full.exists { case (fid, fs, fl) =>
        fid == id && fs <= s && s + l <= fs + fl
      }, s"anchored span ($id,$s,$l) not contained in any full span")
    }
  }

  test("hash-family invariance: production xxhash64 lanes find the same spans") {
    val a = filler("aqz", 57) + block + filler("bxq", 41)
    val b = filler("cwy", 13) + block + filler("dvt", 99)
    val docs = Seq((1L, a), (2L, b), (3L, filler("eus", 120))).toDF("doc_id", "text")
    val port = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 30,
      portable = true).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val prod = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 30,
      portable = false).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(port.sorted.toSeq === prod.sorted.toSeq)
  }

  test("surgery reconstruction invariant holds on the sf0.001 corpus") {
    val docs = graft.Tables.load(spark, GraftTestSpark.sfDir, "documents")
    val out = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", k = 30)
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("orig_len")),
        Seq("doc_id"))
      .select(col("doc_id"), length(col("clean")).cast("long").as("clean_len"),
        col("orig_len"), col("removed_chars"), col("n_spans"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("clean_len") ===
        r.getAs[Long]("orig_len") - r.getAs[Long]("removed_chars"),
        s"length invariant broken for doc ${r.getLong(0)}")
    }
    // Non-vacuous: the sf corpus plants duplicate documents, so spans exist.
    assert(out.exists(_.getAs[Long]("n_spans") > 0L))
  }
}
