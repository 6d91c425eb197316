package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.TextDedup
import graft.functions.TextFunctions._

/** The composed end-to-end curation run — the pipeline a user of this
  * engine actually executes over a raw crawl: model-based quality gate →
  * language gate → exact dedup → MinHash near-dup dedup → split
  * assignment. Every stage is an existing oracle-checked operator applied
  * with its registry parameters; what this adds is the COMPOSITION as one
  * lazy plan and the per-document audit trail (first failing gate), which
  * is what a curation run must emit to be debuggable ("why did doc X
  * disappear?") and re-weightable (per-gate rejection counts).
  *
  * Output: one row per input doc —
  * `(idCol, verdict, split)` with verdict ∈ kept | quality | lang |
  * exact_dup | near_dup (FIRST failing gate — later gates never run on a
  * rejected doc, exactly like the production sequential pipeline) and
  * split ∈ train/val/test for kept docs, null otherwise.
  *
  * Scale shape: the text is scanned once for the per-row gates (one
  * staged tokenization feeds both the classifier logit and the lang-ID
  * hit counts), once for the exact fingerprint, and once by the MinHash
  * stage on the surviving subset; every assembly join carries id-sized
  * rows only (verdict flags, never text). The dedup stages run ON THE
  * FILTERED SUBSET — at 100 TB the quality+lang gates typically drop a
  * large fraction of a raw crawl before the shuffle-bearing stages pay
  * for it, which is why this order is the standard one (quality gates
  * are per-row/shuffle-free; dedup is where the exchanges live).
  */
object CurationPipeline {

  final case class Config(
      lang: String = "en",
      minhash: TextDedup.MinHashConfig =
        TextDedup.MinHashConfig(jaccardThreshold = 0.4, portable = true))

  def audit(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val id = col(idCol)
    // One tokenization feeds both per-row gates — and the gate VERDICTS are
    // materialized once as an id-sized frame (r13): the lazy r12 plan
    // re-evaluated the tokenize + classifier logit + lang-ID subtree per
    // consumer (the verdict assembly, the fingerprint leg, the near-dup
    // leg's survivor join each re-derived it — the corpus paid the gates
    // ~4×). Downstream stages re-read the raw text by a cheap semi-join
    // against the kept ids; only the gate COLUMNS live in block storage.
    val staged = docs.select(id.cast("long").as(idCol), col(textCol),
      tokens(lower(col(textCol))).as("__cp_ws"))
    val gated = withLangGuessFromTokens(
      staged.withColumn("__cp_q",
        qualityClassifierLogit(col(textCol), col("__cp_ws")) >= 0),
      "__cp_ws", "__cp_lang")
      .select(id, col("__cp_q"), col("__cp_lang"))
      .localCheckpoint(true)
    val s1 = docs.select(id.cast("long").as(idCol), col(textCol))
      .join(gated.filter(col("__cp_q") && col("__cp_lang") === cfg.lang)
        .select(id), Seq(idCol), "left_semi")
    // Exact dedup on the survivors: keep the min-id doc per normalized
    // fingerprint (id-only frames past this projection).
    // id-sized too, consumed by both the near-dup leg's input and the
    // verdict assembly — materialized so the md5 fingerprint pass runs once
    val fps = s1.select(id, fingerprint(col(textCol)).as("__cp_fp"))
    val exactKeep = fps
      .join(fps.groupBy(col("__cp_fp")).agg(min(id).as("__cp_keep_id")), Seq("__cp_fp"))
      .select(id, (id === col("__cp_keep_id")).as("__cp_e_keep"))
      .localCheckpoint(true)
    val s2 = s1.join(
      exactKeep.filter(col("__cp_e_keep")).select(id), Seq(idCol), "left_semi")
    // Near-dup dedup on what's left; only the surviving ids come back.
    val ndKeep = TextDedup.minHashDedup(s2, idCol, textCol, cfg.minhash)
      .select(id, lit(true).as("__cp_nd_keep"))
    // Assemble the audit trail: first failing gate wins; the split hash
    // (the t_split rule) applies to kept docs only.
    val h = substring(md5(id.cast("string")), 1, 4)
    gated.select(id, col("__cp_q"), col("__cp_lang"))
      .join(exactKeep, Seq(idCol), "left")
      .join(ndKeep, Seq(idCol), "left")
      .select(id,
        when(!col("__cp_q"), "quality")
          .when(col("__cp_lang") =!= cfg.lang, "lang")
          .when(!col("__cp_e_keep"), "exact_dup")
          .when(col("__cp_nd_keep").isNull, "near_dup")
          .otherwise("kept").as("verdict"))
      .select(id, col("verdict"),
        when(col("verdict") === "kept",
          when(h < "cccc", "train").when(h < "e666", "val").otherwise("test"))
          .as("split"))
  }
}
