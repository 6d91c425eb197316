package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998) as a
  * Catalyst aggregate: per group (one group = one query), greedily pick `k`
  * of the group's candidates maximizing
  *
  *   mmr(c) = λ·rel(c) − (1−λ)·max over selected s of sim(c, s)
  *
  * — the standard diversity rerank between retrieval and a RAG prompt (the
  * shortlist is relevant AND non-redundant, instead of k near-copies of the
  * best hit).
  *
  * Contract: the INPUT is a per-query shortlist (the output of a top-s
  * relevance stage — [[graft.similarity.SimilaritySearch.topKPerKey]] or any
  * ANN path), never the corpus. The greedy is inherently sequential in k, so
  * it runs where the per-query state already is: inside one aggregate
  * evaluation, O(s·k·dim) per query, with the shuffle carrying O(queries·s)
  * shortlist rows once — no per-round join/window cascade, no k round-trip
  * shuffles (an unrolled DataFrame formulation would shuffle the shortlist k
  * times). `maxCandidates` makes the shortlist contract LOUD: a group larger
  * than it (someone aggregated a corpus, not a shortlist) throws with sizing
  * guidance instead of silently buffering unbounded state.
  *
  * Engine-portable arithmetic (the [[graft.similarity.KMeans]] discipline):
  * relevance arrives on the 1e6 integer grid (`floor(score·1e6 + 0.5)` of a
  * cosine/jaccard/BM25 score); pairwise sims are computed here by the same
  * in-order double fold as the SQL oracle's `list_reduce` and land on the
  * same grid; λ is the rational `lambdaNum/1000`, so the mmr objective is
  * `lambdaNum·rel − (1000−lambdaNum)·msim` — exact BIGINTs, identical in any
  * engine, any merge order (grid values ≤ 1e6, so the products stay far
  * under 2⁶³). Ties fall to the smaller candidate id. Round 1 has no
  * selected set: the objective is λ·rel alone (argmax rel under λ > 0), not
  * λ·rel − (1−λ)·0 — a negative best-sim must not be invented.
  *
  * Result: `array<struct<rnk int, cand_id bigint, rel bigint>>` in selection
  * order (rnk 1..k), rel on the input's 1e6 grid. Groups smaller than k
  * return every candidate, still MMR-ordered.
  */
case class MmrSelect(
    candId: Expression,
    rel: Expression,
    vec: Expression,
    k: Int,
    lambdaNum: Int,
    maxCandidates: Int = MmrSelect.DefaultMaxCandidates,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MmrSelect.Buf] {

  require(k >= 1, "k must be positive")
  require(lambdaNum >= 0 && lambdaNum <= 1000, "lambdaNum must be in [0, 1000]")
  require(maxCandidates >= k, "maxCandidates must be >= k")

  override def children: Seq[Expression] = Seq(candId, rel, vec)
  override def nullable: Boolean = false
  override def dataType: DataType = MmrSelect.resultType

  // Strict input types — see TopKByScore: the SQL path inserts no implicit
  // casts before a blind eval/asInstanceOf.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (candId.dataType, rel.dataType, vec.dataType) match {
      case (LongType, LongType, ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (c, r, v) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mmr_select expects (bigint, bigint, array<float>), got " +
            s"(${c.simpleString}, ${r.simpleString}, ${v.simpleString})")
    }

  override def createAggregationBuffer(): MmrSelect.Buf = new MmrSelect.Buf

  override def update(buf: MmrSelect.Buf, input: InternalRow): MmrSelect.Buf = {
    val c = candId.eval(input)
    val r = rel.eval(input)
    val v = vec.eval(input)
    if (c != null && r != null && v != null) {
      buf.add(c.asInstanceOf[Long], r.asInstanceOf[Long],
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray(),
        maxCandidates)
    }
    buf
  }

  override def merge(buf: MmrSelect.Buf, other: MmrSelect.Buf): MmrSelect.Buf = {
    buf.addAll(other, maxCandidates)
    buf
  }

  override def eval(buf: MmrSelect.Buf): Any = {
    val picks = buf.greedy(k, lambdaNum)
    new GenericArrayData(picks.zipWithIndex.map { case ((id, r), i) =>
      InternalRow(i + 1, id, r)
    })
  }

  override def serialize(buf: MmrSelect.Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MmrSelect.Buf =
    MmrSelect.Buf.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MmrSelect =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MmrSelect =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(candId = c(0), rel = c(1), vec = c(2))
}

object MmrSelect {

  /** Shortlists past this are a contract violation (see class doc), not a
    * workload: 4096 candidates × 64-dim floats is ~1 MiB of state per
    * group — comfortably one aggregation buffer; a corpus is not. */
  val DefaultMaxCandidates: Int = 4096

  val resultType: DataType = ArrayType(
    new StructType()
      .add("rnk", IntegerType)
      .add("cand_id", LongType)
      .add("rel", LongType),
    containsNull = false)

  /** 1e6-grid fixed-point of the in-order-fold cosine — bit-identical to
    * the oracle's `floor(list_reduce(...)-based cosine · 1e6 + 0.5)`.
    * Equal-dimension vectors are the CONTRACT (mixed lengths would put
    * relevance and diversity on inconsistent grids — the fused
    * CosineSimilarity folds over the shorter prefix, the SQL folds over
    * full lists); violating it fails loudly instead of silently
    * mis-ranking. */
  private def simInt(a: Array[Float], b: Array[Float]): Long = {
    if (a.length != b.length)
      throw new IllegalStateException(
        s"mmr_select saw vectors of different lengths (${a.length} vs " +
          s"${b.length}) in one group — MMR requires one embedding space " +
          "per shortlist")
    val n = a.length
    var d = 0.0
    var i = 0
    while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    val nn = math.sqrt(na) * math.sqrt(nb)
    val c = if (nn == 0.0) 0.0 else d / nn
    math.floor(c * 1e6 + 0.5).toLong
  }

  /** Growable candidate store: (id, rel) longs + vectors. */
  final class Buf {
    private[MmrSelect] var ids = new Array[Long](8)
    private[MmrSelect] var rels = new Array[Long](8)
    private[MmrSelect] var vecs = new Array[Array[Float]](8)
    private[MmrSelect] var n = 0

    private def grow(cap: Int): Unit =
      if (cap > ids.length) {
        val m = math.max(cap, ids.length * 2)
        ids = java.util.Arrays.copyOf(ids, m)
        rels = java.util.Arrays.copyOf(rels, m)
        vecs = java.util.Arrays.copyOf(vecs, m)
      }

    def add(id: Long, rel: Long, v: Array[Float], max: Int): Unit = {
      if (n >= max)
        throw new IllegalStateException(
          s"mmr_select group exceeds maxCandidates=$max: the input must be a " +
            "per-query SHORTLIST (run a top-s relevance stage first, e.g. " +
            "SimilaritySearch.topKPerKey), not a corpus")
      grow(n + 1)
      ids(n) = id; rels(n) = rel; vecs(n) = v; n += 1
    }

    def addAll(o: Buf, max: Int): Unit = {
      var i = 0
      while (i < o.n) { add(o.ids(i), o.rels(i), o.vecs(i), max); i += 1 }
    }

    /** Greedy MMR over the stored candidates — order-independent of
      * insertion/merge order (each round is a full argmax with the
      * (objective desc, id asc) total order). */
    def greedy(k: Int, lambdaNum: Int): Array[(Long, Long)] = {
      val lb = 1000L - lambdaNum
      val picked = new Array[Boolean](n)
      val msim = new Array[Long](n) // max sim to selected; valid once selCount>0
      val out = new Array[(Long, Long)](math.min(k, n))
      var t = 0
      while (t < out.length) {
        var best = -1
        var bestScore = 0L
        var i = 0
        while (i < n) {
          if (!picked(i)) {
            // Round 1 is a pure relevance argmax regardless of λ (identical
            // ordering to λ·rel for λ>0; for λ=0 it keeps "pure diversity"
            // from degenerating into smallest-id — there is nothing selected
            // yet to be diverse FROM).
            val s =
              if (t == 0) rels(i)
              else lambdaNum * rels(i) - lb * msim(i)
            if (best < 0 || s > bestScore ||
                (s == bestScore && ids(i) < ids(best))) {
              best = i; bestScore = s
            }
          }
          i += 1
        }
        picked(best) = true
        out(t) = (ids(best), rels(best))
        // fold the new pick into every survivor's running max-sim
        i = 0
        while (i < n) {
          if (!picked(i)) {
            val s = simInt(vecs(i), vecs(best))
            if (t == 0 || s > msim(i)) msim(i) = s
          }
          i += 1
        }
        t += 1
      }
      out
    }

    def toBytes: Array[Byte] = {
      var sz = 4
      var i = 0
      while (i < n) { sz += 8 + 8 + 4 + vecs(i).length * 4; i += 1 }
      val bb = ByteBuffer.allocate(sz)
      bb.putInt(n)
      i = 0
      while (i < n) {
        bb.putLong(ids(i)); bb.putLong(rels(i)); bb.putInt(vecs(i).length)
        var j = 0
        while (j < vecs(i).length) { bb.putFloat(vecs(i)(j)); j += 1 }
        i += 1
      }
      bb.array()
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val m = bb.getInt
      val b = new Buf
      var i = 0
      while (i < m) {
        val id = bb.getLong; val r = bb.getLong
        val len = bb.getInt
        val v = new Array[Float](len)
        var j = 0
        while (j < len) { v(j) = bb.getFloat; j += 1 }
        b.add(id, r, v, Int.MaxValue)
        i += 1
      }
      b
    }
  }

  /** Column builder. `rel` must already be on the 1e6 grid (BIGINT). */
  def apply(candId: Column, rel: Column, vec: Column, k: Int,
      lambdaNum: Int, maxCandidates: Int): Column =
    ExpressionUtils.column(
      MmrSelect(ExpressionUtils.expression(candId), ExpressionUtils.expression(rel),
        ExpressionUtils.expression(vec), k, lambdaNum, maxCandidates)
        .toAggregateExpression())
}
