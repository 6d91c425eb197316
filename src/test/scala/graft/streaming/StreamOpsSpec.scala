package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark
import graft.streaming.StreamOps._

class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("flatMapGroupsWithState sessionization emits closed sessions across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[SessionEvent]
    val gapUs = 60L * 1000000 // 1 minute

    val q = sessionize(ms.toDS(), gapUs, idleTimeout = None)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: two bursts separated by > gap within one batch -> first
      // session closes as soon as the second burst is seen.
      ms.addData(
        SessionEvent(1, 1000000, 1.0),
        SessionEvent(1, 2000000, 2.0),
        SessionEvent(1, 200000000, 4.0), // 200s later: new session
        SessionEvent(2, 1000000, 1.0))
      q.processAllAvailable()
      val first = spark.table("sessions_out").as[SessionOut].collect()
      assert(first.toSeq === Seq(SessionOut(1, 1000000, 2000000, 2, 3.0)))

      // next batch: user 1 event far beyond gap closes the pending session
      ms.addData(SessionEvent(1, 500000000, 8.0))
      q.processAllAvailable()
      val second = spark.table("sessions_out").as[SessionOut].collect()
      assert(second.toSet.contains(SessionOut(1, 200000000, 200000000, 1, 4.0)))
    } finally q.stop()
  }

  test("streaming dedup + tumbling counts compose on a file stream") {
    import spark.implicits._
    val dir = GraftTestSpark.tmpDir("streamops")
    Seq((1L, "2024-01-01 00:00:10"), (1L, "2024-01-01 00:00:10"), (2L, "2024-01-01 00:01:10"))
      .toDF("id", "ts").write.parquet(s"$dir/in/f1.parquet")
    val src = spark.readStream.schema("id LONG, ts STRING").parquet(s"$dir/in/*")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    val deduped = dedupWithinWatermark(src, "ts", "10 minutes", "id")
    val counts = tumblingCounts(deduped, "ts", "1 minute", horizon = None)
    val q = counts.writeStream.format("memory").queryName("tumble_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(120000)
      val rows = spark.table("tumble_out").select("n").as[Long].collect().sorted
      assert(rows.toSeq === Seq(1L, 1L)) // dup id collapsed, two 1-min windows
    } finally q.stop()
  }

  test("streaming last-touch attribution over in-order batches matches the batch q_attribution_last_touch answer") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = graft.Tables.load(spark, GraftTestSpark.sfDir, "events")
      .select(col("user_id"), expr("ts div 1000").as("tu"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .sortBy(e => (e._2, e._3)).map(e => TouchEvent(e._1, e._2, e._3, e._4))
    val ms = MemoryStream[TouchEvent]
    val q = StreamOps.lastTouchAttribution(ms.toDS(), "purchase", 604800000000L)
      .writeStream.format("memory").queryName("touch_out")
      .outputMode("append").start()
    try {
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("touch_out").as[TouchOut].collect()
        .groupBy(_.touchType).view.mapValues(_.length.toLong).toMap
      val want = graft.queries.Registry.byName("q_attribution_last_touch")
        .build(spark, GraftTestSpark.sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want, s"streaming $got vs batch $want")
      // each conversion event credited exactly once
      val perConv = spark.table("touch_out").as[TouchOut].collect()
        .groupBy(t => (t.userId, t.eventId)).values
      assert(perConv.forall(_.length == 1))
    } finally q.stop()
  }

  test("streaming funnel over in-order batches matches the batch q_funnel answer") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the real test corpus, delivered in event-time order across 3 batches
    val events = graft.Tables.load(spark, GraftTestSpark.sfDir, "events")
      .select(col("user_id"), expr("ts div 1000").as("tu"), col("event_type"))
      .as[(Long, Long, String)].collect()
      .sortBy(_._2).map(e => FunnelEvent(e._1, e._2, e._3))
    val ms = MemoryStream[FunnelEvent]
    val stages = Seq("signup", "view", "click", "purchase")
    val q = StreamOps.funnel(ms.toDS(), stages, 86400000000L)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("funnel_out").as[FunnelStageOut].collect()
        .groupBy(_.stage).view.mapValues(_.map(_.userId).distinct.length.toLong).toMap
      val want = graft.queries.Registry.byName("q_funnel")
        .build(spark, GraftTestSpark.sfDir)
        .collect().map(r => (r.getLong(0).toInt, r.getLong(2)))
        .filter(_._2 > 0).toMap
      assert(got == want, s"streaming $got vs batch $want")
      // each user completes a stage at most once
      val perUserStage = spark.table("funnel_out").as[FunnelStageOut].collect()
        .groupBy(s => (s.userId, s.stage)).values
      assert(perUserStage.forall(_.length == 1))
    } finally q.stop()
  }
}
