package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}
import graft.dedup.TextDedup

/** Strongest-available evidence for the queries the driver can only
  * rows-check (no DuckDB oracle: genuinely approximate sketches, random
  * hyperplanes, image codecs) PLUS the production-hash-family pins for the
  * sketch queries whose REGISTRY entries now run the portable family under
  * a full DuckDB oracle (t_minhash_pairs/t_minhash_dedup/t_simhash — the
  * xxhash64 family stays the production default and is proven here; the
  * two families share one kernel, differing only in hash constants). Each
  * test proves its subject equivalent to an oracle-checked or
  * independently-reimplemented exact counterpart — the pattern VERDICT r1
  * asked to extend from the LSH recall specs. Sibling fixture-level
  * coverage: TextDedupSpec (minhash/simhash planted dups), WinnowSpec
  * (shared-passage semantics), SimilaritySpec / IvfSpec (ANN recall),
  * MultimodalSpec (stub-kernel determinism), PortableFamilySpec
  * (cross-engine hash constants).
  */
class NoOracleEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val sfDir = GraftTestSpark.sfDir
  private def run(name: String) = Registry.byName(name).build(spark, sfDir)
  private lazy val docs = Tables.load(spark, sfDir, "documents").cache()
  private lazy val emb = Tables.load(spark, sfDir, "embeddings").cache()

  // ---- e_dup_pairs: LSH candidates vs the oracle-checked exact query ------

  test("e_dup_pairs: nonempty, perfect precision, high recall vs e_dup_pairs_exact") {
    val lsh = run("e_dup_pairs").select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exact = run("e_dup_pairs_exact").select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "exact pair set empty: the check would be vacuous")
    assert(lsh.nonEmpty, "registered e_dup_pairs returned 0 rows (vacuous)")
    assert((lsh -- exact).isEmpty, "LSH pairs are exact-verified: precision must be 1.0")
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall vs exact pairs")
  }

  // ---- t_minhash_pairs: LSH+verify vs brute-force exact jaccard -----------

  test("t_minhash_pairs: precision 1.0 and full recall on well-above-threshold pairs") {
    // Plant unambiguous near-dups on top of the real corpus so the exact
    // pair set is provably nonempty.
    val planted = docs.limit(5)
      .withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", concat(col("text"), lit(" extra token")))
    val corpus = docs.unionByName(planted)

    val minhash = TextDedup.nearDuplicatePairs(corpus, "doc_id", "text",
      TextDedup.MinHashConfig(jaccardThreshold = 0.4))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    // exact counterpart over the same shingle-hash sets, all pairs
    val sets = corpus.select(col("doc_id"),
      TextDedup.shingleHashes(col("text"), 3).as("sh")).filter(size(col("sh")) > 0)
    val exact = sets.as("x").join(sets.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          (size(col("x.sh")) + size(col("y.sh"))
            - size(array_intersect(col("x.sh"), col("y.sh")))).cast("double")).as("j"))
      .filter(col("j") >= 0.4)
    val exactPairs = exact.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val strongPairs = exact.filter(col("j") >= 0.6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    assert(strongPairs.nonEmpty, "planted dups must produce strong pairs")
    assert((minhash -- exactPairs).isEmpty, "verify stage is exact: precision must be 1.0")
    assert((strongPairs -- minhash).isEmpty,
      "every jaccard>=0.6 pair must survive 16-band/64-perm LSH")
  }

  // ---- e_quant_topk: int8 quantization must preserve the exact ranking ----

  test("e_quant_topk: quantized top-10 overlaps the exact-cosine top-10") {
    val quant = run("e_quant_topk").select("vec_id").as[Long].collect().toSet
    val exact = run("e_cosine_topk").select("vec_id").as[Long].collect().toSet
    assert(quant.size === 10 && exact.size === 10)
    assert((quant & exact).size >= 8,
      s"int8 quantization lost too much ranking: ${(quant & exact).size}/10")
  }

  // ---- t_minhash_dedup: survivor set vs brute-force jaccard rule ----------

  test("t_minhash_dedup: survivors = min-id per component of brute-force near-dup graph") {
    // the PRODUCTION (xxhash64) family, called directly — the registry
    // entry runs the same kernel under the portable family, where the
    // survivor set has a full recursive-CTE DuckDB oracle
    val survivors = TextDedup.minHashDedup(docs, "doc_id", "text",
        TextDedup.MinHashConfig(jaccardThreshold = 0.4))
      .select("doc_id").as[Long].collect().toSet
    // independent survivor rule: brute-force jaccard pairs over the same
    // normalized shingle-hash sets -> in-JVM union-find -> min per component
    val sets = docs.select(col("doc_id"),
      TextDedup.shingleHashes(col("text"), 3).as("sh")).filter(size(col("sh")) > 0)
    val exactPairs = sets.as("x").join(sets.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          (size(col("x.sh")) + size(col("y.sh"))
            - size(array_intersect(col("x.sh"), col("y.sh")))).cast("double")).as("j"))
      .filter(col("j") >= 0.4).select("a_id", "b_id").as[(Long, Long)].collect()
    val allIds = docs.select("doc_id").as[Long].collect().toSet
    val exactSurvivors = graft.UnionFindRef.minLabels(allIds, exactPairs).values.toSet
    // LSH may miss borderline edges — a missed edge only SPLITS a component,
    // and each split part keeps its own min, so LSH survivors are a superset
    // of the exact-graph survivors; an exact-component min must never drop.
    assert(survivors.subsetOf(allIds))
    assert(exactSurvivors.subsetOf(survivors),
      "the min-id of an exact near-dup component must survive")
    val agreement = (allIds.size - (survivors -- exactSurvivors).size).toDouble / allIds.size
    assert(agreement >= 0.95, s"survivor agreement $agreement vs exact rule")
  }

  // ---- t_simhash: independent Charikar fold reimplementation --------------

  test("t_simhash: matches an independent sign-vector fold over xxhash64 token hashes") {
    // the PRODUCTION (xxhash64, 64-bit) family — the registry query runs the
    // same kernel under the portable md5-prefix family, where it has a full
    // DuckDB oracle (and PortableFamilySpec pins the two families' plumbing)
    val got = TextDedup.simHashes(docs, "doc_id", "text")
      .filter(col("doc_id") < 20)
      .as[(Long, Long)].collect().toMap
    // whitespace-only docs tokenize to [""] in Spark's split; keep the
    // independent fold to unambiguous inputs
    val texts = docs.filter(col("doc_id") < 20 && length(trim(col("text"))) > 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.nonEmpty)
    // independent token hashing: Spark's xxhash64 column function (same
    // primitive, independent plan), fold + tie convention reimplemented here
    val allTokens = texts.flatMap { case (_, t) =>
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").filter(_.nonEmpty)
    }.distinct.toSeq
    val hashOf = allTokens.toDF("tok").select(col("tok"), xxhash64(col("tok")))
      .as[(String, Long)].collect().toMap
    texts.foreach { case (id, t) =>
      val toks = t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").filter(_.nonEmpty)
      val acc = new Array[Int](64)
      toks.foreach { tok =>
        val h = hashOf(tok)
        (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1)
      }
      var expected = 0L
      (0 until 64).foreach(b => if (acc(b) > 0) expected |= (1L << b))
      assert(got(id) === expected, s"doc $id simhash mismatch")
    }
  }

  // ---- t_winnow: registered output vs fingerprint-set invariants ----------

  test("t_winnow: deterministic, complete, and sized like a winnow must be") {
    // registered output is now exploded (doc_id, fp) with a full DuckDB
    // oracle; the invariants here run over the per-doc set sizes
    val a = run("t_winnow").as[(Long, Long)].collect().sortBy(r => (r._1, r._2))
    val b = run("t_winnow").as[(Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq === b.toSeq, "winnow fingerprints must be deterministic")
    val counts = a.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long")).as[(Long, Long)]
      .collect().toMap
    lens.foreach { case (id, len) =>
      val nFps = counts.getOrElse(id, 0L)
      assert(nFps >= 0 && nFps <= len,
        s"doc $id: $nFps fingerprints vs $len chars")
      if (len > 200) assert(nFps > 0, s"long doc $id must have fingerprints")
    }
  }

  // ---- t_winnow_pairs: join-aggregate path vs brute-force intersection ----

  test("t_winnow_pairs: shared counts equal brute-force fingerprint intersection") {
    val viaJoin = run("t_winnow_pairs")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // brute force: all-pairs set intersection over the fingerprint arrays
    val fps = TextDedup.winnowFingerprints(docs, "doc_id", "text")
    val brute = fps.as("x").join(fps.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        size(array_intersect(col("x.fps"), col("y.fps"))).cast("long").as("shared"))
      .filter(col("shared") >= 3)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(brute.nonEmpty, "corpus must produce shared-passage candidates")
    assert(viaJoin === brute,
      "explode-join-aggregate must equal brute-force set intersection")
  }

  // ---- t_token_bpeish: independent JVM-regex reimplementation -------------
  // (also has a DuckDB oracle now — the ASCII pattern is RE2-compatible;
  // this spec additionally pins the semantics on punctuation-rich strings
  // the synthetic corpus doesn't contain)

  test("t_token_bpeish: matches a driver-side regex count exactly") {
    val got = run("t_token_bpeish").filter(col("doc_id") < 50)
      .as[(Long, Long)].collect().toMap
    // the SAME pattern, but evaluated by java.util.regex on the DRIVER —
    // independent of Spark's codegen'd regexp_count path (and of the
    // DuckDB RE2 oracle). NOT the old lookaround-split formulation: that
    // one treats control chars <= 0x20 as whitespace (String.trim), while
    // the kernel deliberately counts non-whitespace control chars as
    // symbol tokens.
    val p = java.util.regex.Pattern.compile(
      graft.functions.TextFunctions.bpeIshPattern)
    def driverCount(t: String): Long = {
      val m = p.matcher(t); var n = 0L; while (m.find()) n += 1; n
    }
    docs.filter(col("doc_id") < 50).select("doc_id", "text").as[(Long, String)]
      .collect().foreach { case (id, t) =>
        assert(got(id) === driverCount(t), s"doc $id bpe-ish count mismatch")
      }
    // a control char is a SYMBOL (not whitespace) under the explicit class
    assert(driverCount("a\u0001b") == 3L)
    // punctuated strings exercise the symbol branch the corpus lacks
    import spark.implicits._
    val planted = Seq((1L, "Hello, world! It's 3.14; x_1=y-2 (a+b)*c"),
      (2L, "..."), (3L, ""), (4L, "a,b,,c--d"))
    val counts = planted.toDF("id", "text")
      .select(col("id"),
        graft.functions.TextFunctions.tokenCountBpeIsh(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 23L, 2L -> 3L, 3L -> 0L, 4L -> 9L))
  }

  // ---- t_approx_distinct: sketch vs exact -------------------------------

  test("t_approx_distinct: HLL++ estimate within rsd bounds of exact distinct") {
    val rows = run("t_approx_distinct")
      .select("source", "approx_docs", "exact_rows").as[(String, Long, Long)].collect()
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("text")).as("d")).as[(String, Long)].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (src, approx, _) =>
      val ex = exact(src)
      val err = math.abs(approx - ex).toDouble / ex
      assert(err <= 0.1, s"source=$src approx=$approx exact=$ex err=$err (rsd=0.02)")
    }
  }

  // ---- e_knn_lsh / e_knn_ivf: registered queries vs brute-force -----------

  private lazy val bruteTop5: Map[Long, Set[Long]] = {
    val queries = emb.filter(col("vec_id") < 20)
    graft.similarity.SimilaritySearch
      .knnJoinBrute(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def knnChecks(name: String, minRecall: Double): Unit = {
    val got = run(name).select("query_id", "cand_id", "rnk")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty, s"$name returned 0 rows")
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 5, s"$name query $q returned ${rows.length} > k rows")
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"$name query $q ranks must be 1..n")
    }
    val hits = got.map(r => (r._1, r._2)).toSet
    val brute = bruteTop5.toSeq.flatMap { case (q, cs) => cs.map((q, _)) }.toSet
    val recall = (hits & brute).size.toDouble / brute.size
    info(s"$name recall@5 = $recall (floor $minRecall)")
    assert(recall >= minRecall, s"$name recall@5=$recall")
  }

  test("e_knn_lsh: registered query shape + recall vs brute force") {
    knnChecks("e_knn_lsh", minRecall = 0.5)
  }

  test("e_knn_ivf: registered query shape + recall vs brute force") {
    knnChecks("e_knn_ivf", minRecall = 0.5)
  }

  // ---- m_decode_features: driver-side independent decode oracle -----------

  test("m_decode_features: real PNG decode matches driver-side pixel math") {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    import graft.multimodal.Multimodal
    val got = run("m_decode_features").filter(col("id") < 10)
      .select("id", "n_bytes", "width", "height", "mean_luma", "frames_sampled")
      .as[(Long, Long, Int, Int, Double, Int)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (id, nBytes, w, h, luma, frames) =>
      // regenerate the planted payload, decode it DRIVER-side, and compute
      // the expected luma with independent pixel math (raster band samples,
      // not the kernel's getRGB bit twiddling)
      val (ew, eh) = Multimodal.plantedDims(id)
      val payload = Multimodal.plantedPng(id * 0x9e3779b97f4a7c15L + 17, ew, eh)
      assert(nBytes === payload.length.toLong, s"doc $id n_bytes")
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      assert(w === img.getWidth && h === img.getHeight, s"doc $id dims")
      val n = w * h
      val raster = img.getRaster
      def bandMean(band: Int): Double =
        raster.getSamples(0, 0, w, h, band, new Array[Double](n)).sum / n
      val exp = 0.299 * bandMean(0) + 0.587 * bandMean(1) + 0.114 * bandMean(2)
      assert(math.abs(luma - exp) < 1e-4, s"doc $id mean_luma")
      assert(frames === math.min(4, payload.length))
    }
  }
}
