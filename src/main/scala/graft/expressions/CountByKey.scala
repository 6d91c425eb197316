package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Per-key row counts as ONE aggregate value (`map<int,bigint>`) — built for
  * `observe()`: a job can carry per-group counts as a CollectMetrics
  * side-channel instead of running a second counting pass. A
  * `groupBy(key).count()` cannot ride `observe()` (metrics must be a single
  * aggregate row), and a per-key `count_if` pivot needs the key domain up
  * front and one expression per key — this is the same fold as a
  * partial-aggregated group-count, with the merge happening in the metrics
  * accumulator.
  *
  * OBSERVABILITY, not bookkeeping: when the CollectMetrics node sits below
  * an exchange it runs in a shuffle-map stage, and map-stage accumulator
  * updates are re-applied when a fetch failure resubmits lost partitions —
  * counts can OVER-report under retries (Spark guarantees once-only
  * application for result stages only). Use it for monitoring/metrics
  * (the ingest-pipeline pattern); anything that must be exact under every
  * retry schedule — a manifest, a ledger — should count committed output
  * instead (ShardWriter counts its staged parquet footers for exactly this
  * reason). Production consumer: the ingest pipeline's per-day row
  * counters (IngestPipeline.writeBatch → Metrics.ingestRowsDay) ride this
  * aggregate on the write pass's observe() node.
  *
  * State is O(distinct keys) per task — by design for BOUNDED key domains
  * (shard numbers, cell ids, day partitions); do not point it at a
  * high-cardinality key. Null keys are ignored (a null shard is a bug the
  * writer's own cast would surface first).
  */
case class CountByKey(
    key: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Int, Long]] {

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(IntegerType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    key.dataType match {
      case IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"count_by_key expects int, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): java.util.HashMap[Int, Long] =
    new java.util.HashMap[Int, Long]()

  override def update(buf: java.util.HashMap[Int, Long], input: InternalRow): java.util.HashMap[Int, Long] = {
    val k = key.eval(input)
    if (k != null) buf.merge(k.asInstanceOf[Int], 1L, (a, b) => a + b)
    buf
  }

  override def merge(buf: java.util.HashMap[Int, Long], other: java.util.HashMap[Int, Long]): java.util.HashMap[Int, Long] = {
    other.forEach((k, v) => buf.merge(k, v, (a, b) => a + b): Unit)
    buf
  }

  override def eval(buf: java.util.HashMap[Int, Long]): Any = {
    // sorted keys: a deterministic map literal regardless of task order
    val ks = new Array[Int](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { ks(i) = it.next(); i += 1 }
    java.util.Arrays.sort(ks)
    val vs = ks.map(buf.get(_))
    ArrayBasedMapData(ks, vs)
  }

  override def serialize(buf: java.util.HashMap[Int, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 12)
    bb.putInt(buf.size)
    buf.forEach((k, v) => { bb.putInt(k); bb.putLong(v) }: Unit)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Int, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[Int, Long](n * 2)
    var i = 0
    while (i < n) { m.put(bb.getInt, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): CountByKey =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountByKey =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(key = c(0))
}

object CountByKey {
  /** Column builder: aggregate to a key→count map. */
  def apply(key: Column): Column =
    ExpressionUtils.column(
      CountByKey(ExpressionUtils.expression(key)).toAggregateExpression())
}
