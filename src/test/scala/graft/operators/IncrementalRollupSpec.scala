package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The additive-view contracts, pinned independently of the registry
  * oracle: incremental ≡ one-shot under RANDOM batching, per-batch replay
  * idempotence (including the state bytes, not just the values), crash
  * repair at both swap windows, and the streaming face over a real
  * foreachBatch query.
  */
class IncrementalRollupSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val Keys = Seq("day", "event_type")

  // A small deterministic fact slice with decimal-exact values: sums that
  // would expose double fold-order drift if the view accumulated doubles.
  private lazy val facts: DataFrame = {
    val rng = new scala.util.Random(7)
    (1 to 400).map { i =>
      val day = f"2024-01-${rng.nextInt(9) + 1}%02d"
      val typ = s"t${rng.nextInt(3)}"
      (i.toLong, day, typ, rng.nextInt(2000000).toDouble / 1e6 + 0.1)
    }.toDF("event_id", "day", "event_type", "value")
  }

  private def oneShot: Map[(String, String), (Long, Double)] =
    facts.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), RelationalOps.exactSum(col("value")).as("tv"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap

  private def viewOf(dir: String): Map[(String, String), (Long, Double)] =
    IncrementalRollup.read(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap

  test("randomly batched incremental build equals the one-shot aggregate") {
    val rng = new scala.util.Random(11)
    (1 to 3).foreach { round =>
      val dir = GraftTestSpark.tmpDir(s"incroll-rand$round")
      val nBatches = 2 + rng.nextInt(4)
      val tagged = facts.withColumn("b",
        pmod(col("event_id") * (round * 2 + 1), lit(nBatches.toLong)))
      (0 until nBatches).foreach { b =>
        assert(IncrementalRollup.applyBatch(spark, dir,
          tagged.where(col("b") === b).drop("b"), b.toLong, Keys, "value"))
      }
      assert(viewOf(dir) === oneShot, s"round $round, $nBatches batches")
    }
  }

  test("a redelivered batch is a no-op, down to the state bytes") {
    val dir = GraftTestSpark.tmpDir("incroll-replay")
    val even = facts.where(pmod(col("event_id"), lit(2)) === 0)
    assert(IncrementalRollup.applyBatch(spark, dir, even, 0L, Keys, "value"))
    assert(IncrementalRollup.applyBatch(spark, dir,
      facts.where(pmod(col("event_id"), lit(2)) === 1), 1L, Keys, "value"))
    def stateBytes(): Seq[(String, Long)] = {
      val d = new java.io.File(dir, "state")
      d.listFiles().filter(_.isFile).map(f => f.getName -> f.length()).toSeq.sorted
    }
    val before = stateBytes()
    // redeliver both batches; neither may apply or rewrite state
    assert(!IncrementalRollup.applyBatch(spark, dir, even, 0L, Keys, "value"))
    assert(!IncrementalRollup.applyBatch(spark, dir, even, 1L, Keys, "value"))
    assert(stateBytes() === before)
    assert(viewOf(dir) === oneShot)
  }

  test("crash repair: a swap interrupted at either rename window recovers") {
    val dir = GraftTestSpark.tmpDir("incroll-crash")
    val even = facts.where(pmod(col("event_id"), lit(2)) === 0)
    assert(IncrementalRollup.applyBatch(spark, dir, even, 0L, Keys, "value"))
    val live = new java.io.File(dir, "state")
    val bak = new java.io.File(dir, "state.bak")
    val tmp = new java.io.File(dir, "state.tmp")
    // crash window 1: live renamed to bak, tmp not yet promoted — the next
    // writer must restore the backup (state AND its ledger move together)
    // before merging its own batch
    assert(live.renameTo(bak))
    assert(IncrementalRollup.applyBatch(spark, dir,
      facts.where(pmod(col("event_id"), lit(2)) === 1), 1L, Keys, "value"))
    assert(viewOf(dir) === oneShot)
    // crash window 2: a stale half-written tmp from an aborted attempt must
    // not poison the next swap
    tmp.mkdirs()
    java.nio.file.Files.write(tmp.toPath.resolve("junk"), Array[Byte](1, 2, 3))
    assert(!IncrementalRollup.applyBatch(spark, dir, even, 0L, Keys, "value"))
    assert(viewOf(dir) === oneShot)
    assert(!tmp.exists() || tmp.listFiles().isEmpty)
  }

  test("streaming maintenance through foreachBatch equals the batch rollup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = GraftTestSpark.tmpDir("incroll-stream")
    val ckpt = GraftTestSpark.tmpDir("incroll-ckpt")
    val ms = MemoryStream[(Long, String, String, Double)]
    val rows = facts.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSeq
    val stream = ms.toDF().toDF("event_id", "day", "event_type", "value")
    val (h1, h2) = rows.splitAt(rows.size / 2)
    ms.addData(h1: _*)
    val q = IncrementalRollup.maintain(stream, dir, ckpt, Keys, "value")
    try {
      q.processAllAvailable()
      ms.addData(h2: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(viewOf(dir) === oneShot)
  }
}
