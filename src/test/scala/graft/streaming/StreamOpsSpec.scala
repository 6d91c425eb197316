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
}
