package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance record linkage (fuzzy join) — match noisy keys (typo'd
  * titles, OCR'd names, mangled metadata) to a canonical side within
  * Levenshtein distance k, WITHOUT the all-pairs cross join.
  *
  * Candidate generation is the segment-pigeonhole scheme (PassJoin,
  * Li/Deng/Jiang/Feng, PVLDB 2011 — public literature): split every
  * canonical string of length L into k+1 contiguous segments; if
  * lev(q, r) <= k then at least one of r's k+1 segments appears in q
  * EXACTLY, at a start position shifted by at most k from its position in
  * r (k edits can't touch all k+1 segments, and the untouched one can
  * only be displaced by the edits before it). So:
  *
  *  - right (canonical) side explodes into k+1 (segment, idx, L) keys;
  *  - left (noisy) side explodes into its substrings at the aligned
  *    positions ±k for every candidate length L in [len(q)-k, len(q)+k]
  *    — O((k+1)·(2k+1)²) keys per row, a small constant for small k;
  *  - equi-join on (segment, idx, L), distinct candidate id pairs, then
  *    one exact `levenshtein` verify per candidate.
  *
  * Scale design: both explodes are linear maps (no shuffle until the
  * equi-join); the join is a plain hash join on short string keys; the
  * quadratic danger lives only in hot segment keys (e.g. a segment shared
  * by a million near-identical strings), which `hotKeyCap` bounds with
  * the dedup family's census discipline — count right-side rows per key,
  * drop keys above the cap (a RECALL trade, documented loudly, never an
  * OOM). Empty segments (L <= k) degrade to a per-length tiny-string
  * bucket join, which is exactly right: strings shorter than k+1
  * characters are a bounded vocabulary.
  *
  * Completeness (zero missed pairs at any partitioning) is pinned by
  * FuzzyLinkSpec's brute-force equivalence battery; the registry entry
  * `t_fuzzy_link` carries a full DuckDB oracle (the oracle brute-forces —
  * same result, different plan, which is the point).
  */
object FuzzyLink {

  /** All (segment, idx) pairs of a string of length L under the even
    * k+1-split, as select-ready columns over `str`: segment i covers
    * [i*L/(k+1), (i+1)*L/(k+1)) (0-based, integer division). */
  private def segStart(i: Column, len: Column, k: Int): Column =
    floor(i * len / (k + 1)).cast("int")

  /** Explode the canonical side into its k+1 segment keys.
    * Emits (idCol, strCol, seg_idx, seg_key, target_len). */
  private def segmentKeys(right: DataFrame, idCol: String, strCol: String,
      k: Int): DataFrame = {
    val len = length(col(strCol))
    right
      .select(col(idCol), col(strCol), len.as("target_len"),
        explode(sequence(lit(0), lit(k))).as("seg_idx"))
      .withColumn("__s", segStart(col("seg_idx"), col("target_len"), k))
      .withColumn("__e", segStart(col("seg_idx") + 1, col("target_len"), k))
      // substring is 1-based; empty segments yield "" (the tiny-string bucket)
      .withColumn("seg_key",
        expr(s"substring($strCol, __s + 1, __e - __s)"))
      .drop("__s", "__e")
  }

  /** Explode the noisy side into every substring that could equal an
    * aligned segment of a match: for each candidate target length L in
    * [len(q)-k, len(q)+k] and segment idx i, the substrings starting
    * within ±k of the segment's home position.
    * Emits (idCol, strCol, seg_idx, seg_key, target_len), distinct per
    * (id, idx, key, L) so the join never fans out on repeated keys. */
  private def probeKeys(left: DataFrame, idCol: String, strCol: String,
      k: Int): DataFrame = {
    val lenQ = length(col(strCol))
    left
      .select(col(idCol), col(strCol), lenQ.as("__lq"),
        explode(sequence(greatest(lenQ - k, lit(0)), lenQ + k))
          .as("target_len"))
      .filter(col("target_len") >= 0)
      .select(col(idCol), col(strCol), col("__lq"), col("target_len"),
        explode(sequence(lit(0), lit(k))).as("seg_idx"))
      .withColumn("__s", segStart(col("seg_idx"), col("target_len"), k))
      .withColumn("__e", segStart(col("seg_idx") + 1, col("target_len"), k))
      .withColumn("__sl", col("__e") - col("__s"))
      // start positions: clamp([s-k, s+k]) ∩ [0, len(q)-segLen]; empty
      // segments probe only their home position (the "" bucket key).
      // sequence(lo, hi) DESCENDS when lo > hi — an inverted (empty)
      // window must yield no positions, not a reversed range.
      .withColumn("__lo", greatest(col("__s") - k, lit(0)))
      .withColumn("__hi", least(col("__s") + k, col("__lq") - col("__sl")))
      .withColumn("p",
        explode(when(col("__sl") === 0, array(col("__s")))
          .when(col("__lo") <= col("__hi"),
            sequence(col("__lo"), col("__hi")))
          .otherwise(array().cast("array<int>"))))
      .filter(col("__sl") === 0 ||
        (col("p") >= 0 && col("p") + col("__sl") <= col("__lq")))
      .withColumn("seg_key", expr(s"substring($strCol, p + 1, __sl)"))
      .select(col(idCol), col(strCol), col("seg_idx"), col("seg_key"),
        col("target_len"))
      .distinct()
  }

  /** Fuzzy join: all (left id, right id, dist) with
    * `levenshtein(leftStr, rightStr) <= k` (dist 0 = exact included).
    *
    * @param hotKeyCap if set, segment keys indexing more than this many
    *                  canonical rows are dropped from candidate
    *                  generation — a recall trade that bounds the join's
    *                  worst key (the dedup census discipline). None =
    *                  exact (FuzzyLinkSpec's equivalence battery runs
    *                  uncapped).
    */
  def editJoin(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      k: Int, hotKeyCap: Option[Int] = None): DataFrame = {
    require(k >= 1 && k <= 3, s"k must be in [1, 3], got $k (larger radii " +
      "need a different candidate scheme — segment keys degrade)")
    require(hotKeyCap.forall(_ >= 1), "hotKeyCap must be >= 1")
    val segs0 = segmentKeys(right, rightId, rightStr, k)
    val segs = hotKeyCap match {
      case None => segs0
      case Some(cap) =>
        val hot = segs0.groupBy("seg_idx", "seg_key", "target_len")
          .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
          .drop("__n")
        segs0.join(broadcast(hot), Seq("seg_idx", "seg_key", "target_len"),
          "left_anti")
    }
    val probes = probeKeys(left, leftId, leftStr, k)
    probes
      .join(segs, Seq("seg_idx", "seg_key", "target_len"))
      .select(col(leftId), col(leftStr), col(rightId), col(rightStr))
      .distinct()
      .withColumn("dist", levenshtein(col(leftStr), col(rightStr)))
      .filter(col("dist") <= k)
  }
}
