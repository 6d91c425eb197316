package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Grouped top-k as a Catalyst aggregate: per group, keep the k highest
  * (score, id) pairs — score descending, ties broken toward the smaller id
  * — returned as a sorted `array<struct<score double, id bigint>>`.
  *
  * The standard Spark formulation (`row_number()` over a window, then
  * `filter(rank <= k)`) shuffles and SORTS every candidate row per group.
  * As an aggregate this gets partial aggregation instead: each map task
  * reduces its candidates to at most k entries per group before the
  * shuffle, so at 10⁹ candidate rows the exchange carries O(groups·k)
  * — the difference between shuffling the candidate set and shuffling the
  * answer. The buffer is a bounded binary min-heap (the weakest kept entry
  * on top), O(log k) per update and O(k) bytes serialized.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Heap] {

  require(k >= 1, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType

  // Strict input types: without this, analysis passes for any column types
  // and update() would ClassCastException at executor runtime on the SQL
  // path (no implicit cast is inserted for blind eval/asInstanceOf).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_by_score expects (double, bigint), got (${s.simpleString}, ${i.simpleString})")
    }

  override def createAggregationBuffer(): TopKByScore.Heap = new TopKByScore.Heap(k)

  override def update(buf: TopKByScore.Heap, input: InternalRow): TopKByScore.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKByScore.Heap, other: TopKByScore.Heap): TopKByScore.Heap = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: TopKByScore.Heap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: TopKByScore.Heap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKByScore.Heap =
    TopKByScore.Heap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

object TopKByScore {

  val resultType: DataType = ArrayType(
    new StructType().add("score", DoubleType).add("id", LongType),
    containsNull = false)

  /** Bounded binary min-heap of (score, id): the WEAKEST kept entry (lowest
    * score; ties → largest id) sits at the root and is evicted first, so
    * after any insertion order the kept set is exactly the k best. */
  final class Heap(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    // entry a is weaker than entry b (evicted before it). Double.compare
    // gives a TOTAL order with NaN greatest — matching Spark's window
    // ordering (NaN sorts above every double) and keeping the heap sound:
    // a raw `<` is always false around NaN, which would wedge a NaN at the
    // root and block every later eviction.
    private def weaker(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      c < 0 || (c == 0 && ia > ib)
    }

    private def swap(a: Int, b: Int): Unit = {
      val s = scores(a); scores(a) = scores(b); scores(b) = s
      val i = ids(a); ids(a) = ids(b); ids(b) = i
    }

    private def siftUp(start: Int): Unit = {
      var c = start
      while (c > 0 && weaker(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    }

    private def siftDown(): Unit = {
      var p = 0
      var done = false
      while (!done) {
        var weakest = p
        val l = 2 * p + 1
        val r = 2 * p + 2
        if (l < n && weaker(scores(l), ids(l), scores(weakest), ids(weakest))) weakest = l
        if (r < n && weaker(scores(r), ids(r), scores(weakest), ids(weakest))) weakest = r
        if (weakest == p) done = true
        else { swap(p, weakest); p = weakest }
      }
    }

    def offer(s: Double, i: Long): Unit =
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1; siftUp(n - 1)
      } else if (weaker(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i; siftDown()
      }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(scores(i), ids(i)); i += 1 }
    }

    def sortedDesc: Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var i = 0
      while (i < n) { out(i) = (scores(i), ids(i)); i += 1 }
      // total order (Double.compare) — a raw > comparator violates the sort
      // contract under NaN and can throw in TimSort
      out.sortWith { case ((sa, ia), (sb, ib)) =>
        val c = java.lang.Double.compare(sa, sb)
        c > 0 || (c == 0 && ia < ib)
      }
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + n * 16)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object Heap {
    def fromBytes(k: Int, bytes: Array[Byte]): Heap = {
      val bb = ByteBuffer.wrap(bytes)
      val m = bb.getInt
      val h = new Heap(k)
      var i = 0
      while (i < m) { h.offer(bb.getDouble, bb.getLong); i += 1 }
      h
    }
  }

  /** Column builder: aggregate to the top-k (score, id) array. */
  def apply(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
        .toAggregateExpression())
}
