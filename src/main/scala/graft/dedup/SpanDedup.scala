package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.portableHash60

/** Exact duplicated-substring detection and removal — the character-level
  * complement of the document/passage dedup family (the reference's dedup
  * surface is row-level: `hedera-etl` deduplicates whole transaction rows,
  * `deduplicate_transactions.sql`; a training-data pipeline additionally
  * strips VERBATIM REPEATED SPANS that survive document-level dedup, e.g.
  * boilerplate headers, license blocks, templated paragraphs).
  *
  * Method (the published exact-substring-dedup shape, re-expressed
  * relationally): every length-`k` character gram of every document is
  * fingerprinted with position; a gram whose fingerprint occurs at ≥ 2
  * corpus locations (across documents OR repeated within one) marks its
  * `[p, p+k)` character interval as duplicated; per document, overlapping
  * and adjacent marked intervals merge into maximal spans (interval-island
  * detection); span removal cuts the merged spans out of the original text
  * and stitches the kept segments back in order. Removal is SYMMETRIC —
  * every occurrence of duplicated content is cut, not "all but the first" —
  * so the result is independent of any document ordering and deterministic
  * under any partitioning.
  *
  * Spark-first shape and the 100 TB story:
  *  - The gram frame carries `(id, pos, hash)` — the text itself never
  *    enters the wide stages; at stride 1 that is one row per character,
  *    which is the exact algorithm's cost. The scale lever is
  *    `anchorStride`: keep only CONTENT-DEFINED anchor grams
  *    (`hash mod s == 0` — a function of the gram bytes alone, never the
  *    position), which cuts the frame by ~s× while still selecting the
  *    SAME anchors inside every copy of a duplicated region, wherever it
  *    sits in its document. Copies therefore still collide, and a
  *    duplicated span of length L ≥ k contains an anchor with probability
  *    1 − (1−1/s)^(L−k+1) (anchor gaps are ~geometric with mean s) — the
  *    standard content-defined-chunking recall bound. Position-strided
  *    sampling (every s-th offset) has NO such guarantee: the two copies'
  *    sampled offsets need not align.
  *  - Duplicate detection is groupBy(hash)-count then an id+pos ⋈ hash
  *    equi-join back — partial aggregation shrinks the count stream
  *    map-side, and AQE's skew-join split handles pathological grams
  *    (a window `count over (partition by hash)` would pin each hot gram
  *    on one task — rejected for exactly that reason).
  *  - Island-merge is one exchange by document id over marked positions
  *    (ints only); the merged span frame is duplicated-content-sized,
  *    orders of magnitude below the corpus.
  *  - Surgery joins spans back to the documents on id — the one stage
  *    where text crosses a shuffle, same budget as passage dedup. The
  *    spans frame feeds two window branches (pre-segments + tails); it is
  *    span-sized, so recomputation is cheap at any scale (a production
  *    driver may `localCheckpoint` it to scan the gram pipeline once).
  *
  * Hash families (the t_simhash discipline — the family is a parameter,
  * not a fork): `portable = true` uses the md5-prefix 60-bit family so
  * DuckDB replays the exact pipeline byte-for-byte (registry entries);
  * `portable = false` runs two independently-salted xxhash64 lanes
  * (~128-bit effective) for production corpora, where 60 bits would
  * birthday-collide around 10^9 distinct grams. A collision conflates two
  * distinct grams and over-marks a span — at 128 bits that is a ~2^-64
  * event per pair, negligible against 100 TB gram counts.
  */
object SpanDedup {

  /** Positioned k-gram fingerprints: one row `(id, p, h…)` per kept gram
    * (1-based start, gram covers chars `[p, p+k)`). `anchorStride > 1`
    * keeps only content-defined anchors (`pmod(h, s) == 0` on the
    * family's own primary hash — content-defined per family, and on the
    * portable family byte-replayable by the oracle). Documents shorter
    * than `k` and null texts emit nothing. */
  def kgramFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      anchorStride: Int = 1,
      portable: Boolean = false): DataFrame = {
    require(k >= 2, s"gram length must be >= 2, got $k")
    require(anchorStride >= 1, s"anchorStride must be >= 1, got $anchorStride")
    val gram = col(textCol).substr(col("p"), lit(k))
    // Spread documents across the cluster BEFORE the ~len× position
    // explode: the per-gram hash is the compute bottleneck by
    // construction (k bytes digested per character of corpus), and a
    // coarse scan (one small parquet file locally; oversized row groups
    // on an object store) would otherwise pin the whole expansion on a
    // few tasks. The spread costs one corpus-bandwidth shuffle — k×
    // below the hash work it parallelizes. Exploded rows must NOT cross
    // an exchange themselves: each carries the full text, so a
    // post-explode shuffle would copy every document ~len× (the
    // repartition sits deliberately BEFORE explode, never after).
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val base = docs
      .where(length(col(textCol)) >= k)
      .repartition(par, col(idCol))
      .select(col(idCol), col(textCol),
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("p"))
      .select(col(idCol), col("p"), gram.as("gram"))
    // Each family anchors on its OWN primary hash — the anchor predicate
    // only needs to be content-defined (a function of the gram bytes), not
    // shared across families; this keeps md5 off the production lane.
    val hashed =
      if (portable)
        base.select(col(idCol), col("p"),
          portableHash60(concat(lit("span:"), col("gram"))).as("h"))
      else
        base.select(col(idCol), col("p"),
          xxhash64(lit("span-a:"), col("gram")).as("h"),
          xxhash64(lit("span-b:"), col("gram")).as("h2"))
    if (anchorStride == 1) hashed
    else hashed.where(pmod(col("h"), lit(anchorStride.toLong)) === 0L)
  }

  /** Maximal duplicated spans per document: `(id, span_start, span_len)`
    * (BIGINT, 1-based), overlapping/adjacent marked grams merged. */
  def duplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      anchorStride: Int = 1,
      portable: Boolean = false): DataFrame = {
    val grams = kgramFingerprints(docs, idCol, textCol, k, anchorStride, portable)
    val hashCols = grams.columns.filter(_.startsWith("h")).map(col).toSeq
    val dup = grams.groupBy(hashCols: _*)
      .agg(count(lit(1)).as("c")).where(col("c") >= 2)
      .select(hashCols: _*)
    val marked = grams.join(dup, hashCols.map(_.toString))
      .select(col(idCol), col("p"))
    val byId = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val prevEnd = max(col("p") + k)
      .over(byId.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("nw", when(col("p") > coalesce(prevEnd, lit(0)), 1).otherwise(0))
      .withColumn("island", sum(col("nw"))
        .over(byId.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("p")).as("s"), max(col("p") + k).as("e"))
      .select(col(idCol),
        col("s").cast("long").as("span_start"),
        (col("e") - col("s")).cast("long").as("span_len"))
  }

  /** Span surgery: `(id, <textCol> → clean, n_spans, removed_chars)` —
    * every duplicated span cut, kept segments stitched in original order;
    * documents with no duplicated span (or null text) pass through with
    * `n_spans = 0`. */
  def removeDuplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      anchorStride: Int = 1,
      portable: Boolean = false): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, k, anchorStride, portable)
      .withColumn("e", col("span_start") + col("span_len"))
    // The spans frame feeds exactly ONE window pass (Spark does not reuse
    // exchanges whose children differ in pruned columns, so every extra
    // consumer of `spans` would re-run the whole gram pipeline — measured
    // 13 corpus scans for the naive pre/tails/stats three-branch shape):
    // each span row emits its PRE-segment [prev end (or 1), start), the
    // last span row additionally emits the TAIL [max end, len+1) — `en`
    // resolved against the text length after the docs join — and the
    // per-doc stats ride the same rows as window aggregates, folded out
    // by the final groupBy.
    val ordered = Window.partitionBy(col(idCol)).orderBy(col("span_start"))
    val whole = Window.partitionBy(col(idCol))
    val preSeg = struct(col("pre_st").as("st"), col("span_start").as("en"))
    val tailSeg = struct(col("e").as("st"), lit(null).cast("long").as("en"))
    val segs = spans
      .withColumn("n_spans", count(lit(1)).over(whole))
      .withColumn("removed_chars", sum(col("span_len")).over(whole))
      // Window expressions materialize as plain columns BEFORE the explode
      // below — a window call inside a generator is unresolvable.
      .withColumn("pre_st", coalesce(lag(col("e"), 1).over(ordered), lit(1L)))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("seg", explode(
        when(col("rn") === col("n_spans"), array(preSeg, tailSeg))
          .otherwise(array(preSeg))))
      .select(col(idCol), col("seg.st").as("st"), col("seg.en").as("en"),
        col("n_spans"), col("removed_chars"))
    docs.select(col(idCol), col(textCol))
      .join(segs, Seq(idCol), "left")
      .withColumn("en", coalesce(col("en"), length(col(textCol)).cast("long") + 1L))
      .withColumn("seg",
        when(col("st").isNull, col(textCol))
          .otherwise(col(textCol).substr(col("st").cast("int"),
            (col("en") - col("st")).cast("int"))))
      .groupBy(col(idCol))
      // sort_array on (st, seg) structs orders by segment start — the only
      // deterministic ordered-concat Spark offers without a second window.
      .agg(
        array_join(
          transform(sort_array(collect_list(struct(coalesce(col("st"), lit(0L)).as("st"),
            coalesce(col("seg"), lit("")).as("seg")))), x => x.getField("seg")),
          "").as("clean_raw"),
        // Null text restores to null from a flag carried through the agg —
        // a second docs join for the source text would re-scan the corpus.
        max(when(col(textCol).isNull, 1).otherwise(0)).as("nt"),
        max(coalesce(col("n_spans"), lit(0L))).as("n_spans"),
        max(coalesce(col("removed_chars"), lit(0L))).as("removed_chars"))
      .select(col(idCol),
        when(col("nt") === 1, lit(null).cast("string"))
          .otherwise(col("clean_raw")).as("clean"),
        col("n_spans"), col("removed_chars"))
  }
}
