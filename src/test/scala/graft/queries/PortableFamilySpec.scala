package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}
import graft.dedup.TextDedup
import graft.functions.TextFunctions

/** Pins the PORTABLE hash family — the md5-prefix 60-bit hash and the
  * mod-(2^31−1) affine permutations that let DuckDB replay the sketch
  * pipelines byte-for-byte (full oracles on t_minhash_pairs,
  * t_minhash_dedup, t_simhash). Three independent implementations must
  * agree: the Spark column builders (what the registry runs), a driver-side
  * `java.security.MessageDigest` fold (what SimHash64's portable kernel
  * uses internally), and hard-coded constants computed by DuckDB 1.0 with
  * `('0x' || substr(md5(s), 1, 15))::BIGINT` — the cross-engine anchor.
  */
class PortableFamilySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val sfDir = GraftTestSpark.sfDir

  // DuckDB 1.0: SELECT ('0x'||substr(md5(s),1,15))::BIGINT for each s.
  private val duckAnchors = Seq(
    "hello world" -> 426544247714475757L,
    "abc" -> 648541476951500027L,
    "" -> 955282973525019424L)

  test("portableHash60 equals DuckDB's hex-prefix parse on anchor strings") {
    // three implementations must agree on every anchor: the DuckDB-computed
    // literals above (the cross-engine pin), a driver-side JDK md5 fold,
    // and the Spark column builder the registry queries run
    duckAnchors.foreach { case (s, duck) =>
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(java.lang.Long.parseLong(hex.take(15), 16) === duck,
        s"JDK md5 prefix disagrees with DuckDB on '$s'")
    }
    val got = duckAnchors.map(_._1).toDF("s")
      .select(col("s"), TextFunctions.portableHash60(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    duckAnchors.foreach { case (s, duck) =>
      assert(got(s) === duck, s"portableHash60('$s')")
    }
  }

  test("portable SimHash64 kernel equals the column-level portableHash60 fold") {
    val docs = Tables.load(spark, sfDir, "documents").limit(50).cache()
    val got = TextDedup.simHashes(docs, "doc_id", "text", portable = true)
      .as[(Long, Long)].collect().toMap

    // independent path: hash tokens with the COLUMN builder (md5/conv
    // built-ins — not the kernel's MessageDigest), fold on the driver
    val toks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(TextFunctions.normalized(col("text")))).as("t"))
      .select(col("doc_id"), TextFunctions.portableHash60(col("t")).as("h"))
      .as[(Long, Long)].collect()
    toks.groupBy(_._1).foreach { case (id, hs) =>
      val acc = new Array[Int](60)
      hs.foreach { case (_, h) =>
        (0 until 60).foreach(b => if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1)
      }
      var expected = 0L
      (0 until 60).foreach(b => if (acc(b) > 0) expected |= (1L << b))
      assert(got(id) === expected, s"doc $id portable simhash mismatch")
    }
  }

  test("portable MinHashSignature equals a driver-side affine-min recompute") {
    val P = 2147483647L
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val sigs = TextDedup.signatures(docs, "doc_id", "text",
        TextDedup.MinHashConfig(portable = true))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"), col("sig"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(sigs.nonEmpty)
    sigs.foreach { case (id, sh, sig) =>
      assert(sig.length === 64)
      (0 until 64).foreach { p =>
        val a = ((p + 1) * 2654435761L) % P
        val b = ((p + 1) * 1779033703L) % P
        val expected = sh.map(x => (a * (x % P) + b) % P).min
        assert(sig(p) === expected, s"doc $id perm $p")
      }
    }
  }

  test("portable near-dup pairs stay exact-verified (precision 1.0)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = TextDedup.nearDuplicatePairs(docs, "doc_id", "text",
      TextDedup.MinHashConfig(jaccardThreshold = 0.4, portable = true))
    val bad = pairs.filter(col("jaccard") < 0.4).count()
    assert(bad === 0L)
    assert(pairs.count() > 0L, "portable family must still find the planted near-dups")
  }
}
