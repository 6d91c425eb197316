package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016) — the
  * tokenizer-training pass of an LLM data pipeline: learn the `k` most
  * frequent adjacent symbol merges over the corpus word-frequency table.
  *
  * Scale shape: the CORPUS is touched exactly once (the tokenize +
  * word-count pass of [[wordFreqs]] — partial-aggregated, text never
  * shuffled beyond the word keys). All `k` merge iterations then run on the
  * VOCAB frame (|distinct words| rows — millions at 100 TB, not billions),
  * each iteration one pair-count aggregation + one bounded argmax collect
  * (a single row) + one per-word symbol rewrite, with `localCheckpoint`
  * truncating the k-deep lineage the same way ConnectedComponents' fixpoint
  * does. The greedy left-to-right merge inside a word is a sequential
  * recurrence, expressed as an `aggregate` HOF fold over the symbol array —
  * per-row work on a vocab-sized frame, off the corpus hot path, so the
  * interpreted-HOF cost is bounded by the vocabulary (the WordShingles
  * interpreted-HOF caveat does not bite here).
  *
  * Determinism: pair counts are integer `freq` sums; the argmax breaks ties
  * by (count DESC, left ASC, right ASC) on binary string order — the whole
  * merge sequence is engine-exact, which is what lets the registry entry
  * carry a FULL DuckDB oracle with the iteration unrolled one CTE block per
  * round (the SourceRankCtes discipline).
  *
  * Reference scope: the reference pipeline (blockchain-etl/hedera-etl) has
  * no tokenizer training; this is part of the training-data extension
  * family the builder prompt asks for beyond reference parity.
  */
object BpeVocab {

  /** One corpus pass: lowercase whitespace words → (word, freq). Empty
    * words are excluded (a whitespace-only document tokenizes to one empty
    * string under split semantics; it carries no symbols to merge). */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence: one single-character symbol per position,
    * via 1-based `substr` over a `sequence` — the same per-codepoint
    * slicing the oracle uses (`substr(word, i, 1)`), so both engines build
    * identical symbol arrays without relying on engine-specific
    * split-on-empty-separator behavior. */
  private def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1)))

  /** Greedy left-to-right application of one merge (l, r) to a symbol
    * array: scan with a (emitted, pending) state — a pending `l` followed
    * by `r` emits the merged symbol and clears; anything else flushes the
    * pending symbol. Exactly the textbook BPE merge order ("aaaa" under
    * (a,a) → ["aa","aa"], "aaa" → ["aa","a"]). */
  private[operators] def mergePair(syms: Column, l: Column, r: Column): Column = {
    val init = struct(
      array().cast("array<string>").as("out"), lit(null).cast("string").as("p"))
    aggregate(syms, init,
      (st, s) =>
        when(st.getField("p").isNull,
          struct(st.getField("out").as("out"), s.as("p")))
          .when(st.getField("p") === l && s === r,
            struct(concat(st.getField("out"), array(concat(l, r))).as("out"),
              lit(null).cast("string").as("p")))
          .otherwise(
            struct(concat(st.getField("out"), array(st.getField("p"))).as("out"),
              s.as("p"))),
      st =>
        when(st.getField("p").isNull, st.getField("out"))
          .otherwise(concat(st.getField("out"), array(st.getField("p")))))
  }

  /** Adjacent symbol pairs of a word, weighted later by its frequency. */
  private def adjacentPairs(syms: Column): Column =
    transform(slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      (x, i) => struct(x.as("l"), element_at(syms, i + lit(2)).as("r")))

  /** Learn `k` merges; returns (rnk, lhs, rhs, cnt) with rnk 1-based in
    * merge order. EAGER by necessity (the Q.build lazy-contract trade the
    * trigram-LM entry documents): each round's argmax is a bounded
    * single-row collect, and the rewritten vocab frame is
    * localCheckpoint'd so round j never replays rounds 1..j-1. Stops early
    * only if the vocabulary runs out of adjacent pairs (single-letter
    * vocab) — impossible on any real corpus and not on the registry data;
    * the fixed-k oracle assumes it. */
  def merges(spark: SparkSession, docs: DataFrame, textCol: String, k: Int): DataFrame = {
    var cur = wordFreqs(docs, textCol)
      .select(col("word"), col("freq"), charSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val top = cur.select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((rank.toLong, l, r, c))
        val prev = cur
        cur = cur.select(col("word"), col("freq"),
            mergePair(col("syms"), lit(l), lit(r)).as("syms"))
          .localCheckpoint(true)
        prev.unpersist()
        rank += 1
      }
    }
    import spark.implicits._
    out.result().toDF("rnk", "lhs", "rhs", "cnt") // k rows — a driver-built local relation
  }

  /** Distributed corpus encoding under a FIXED learned merge list — the
    * inference half at scale. The corpus is touched ONCE (the same
    * word-count pass as training); the k-merge rewrite then runs per
    * DISTINCT word via the native [[graft.expressions.BpeEncode]] kernel
    * (never per occurrence — at 100 TB the vocab is millions of rows while
    * the corpus is billions), and occurrence-weighting rides the integer
    * `freq`. Returns corpus token counts (token, cnt). A per-document
    * token sequence, when needed, is a broadcast word→tokens map join
    * against this same vocab-sized frame. */
  def encodeTokens(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    wordFreqs(docs, textCol)
      .select(explode(graft.expressions.BpeEncode(col("word"), merges)).as("token"),
        col("freq"))
      .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))

  /** Re-tokenize a word with a learned merge list (applied in rank order)
    * — the inference half, used by the spec to assert round-trip
    * consistency with the training rewrite. Plain Scala (driver/test
    * utility; production encoding would bind the merge list into the same
    * aggregate-fold expression). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString)
    merges.foreach { case (l, r) =>
      val out = Seq.newBuilder[String]
      var pending: String = null
      syms.foreach { s =>
        if (pending == null) pending = s
        else if (pending == l && s == r) { out += (l + r); pending = null }
        else { out += pending; pending = s }
      }
      if (pending != null) out += pending
      syms = out.result().toIndexedSeq
    }
    syms
  }
}
