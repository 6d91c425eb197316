package graft.metrics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark
import graft.hedera._

/** The reference's ingest + dedupe metrics must actually be WRITTEN, not
  * just declared (TransactionJsonToTableRow.java:42-49, Utility.java:40-46,
  * AbstractDeduplication.java:128-160, TemplateQuery.java:67-89).
  */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("ingestBatch wires latestConsensusTimestamp / ingestionDelay / jsonToTableRowErrors") {
    val reg = new MetricsRegistry
    val base = GraftTestSpark.tmpDir("metrics")
    val ts = 1600000000L * 1000000000L + 123456789L
    Seq(
      s"""{"consensusTimestamp":$ts,"transactionType":14}""",
      s"""{"consensusTimestamp":${ts + 1000},"transactionType":7}""",
      """this line is not json"""
    ).toDF("value").coalesce(1).write.text(s"$base/in")

    val pipe = new IngestPipeline(spark,
      new TransactionsTable(spark, s"$base/transactions"),
      new ErrorsTable(spark, s"$base/errors"), reg = reg)
    val (ok, bad) = pipe.ingestBatch(s"$base/in")
    assert(ok === 2 && bad === 1)

    assert(reg.get(Metrics.LatestConsensusTimestamp) === ts + 1000,
      "max ns key of the batch")
    assert(reg.get(Metrics.JsonToTableRowErrors) === 1)
    // batch-commit wall clock is 'now', event time is 2020 → large positive ms
    assert(reg.get(Metrics.IngestionDelay) > 0)

    // per-day row counts ride the SAME observe() pass via the map-typed
    // CountByKey aggregate — both ok rows land on the same event day
    val day = java.time.LocalDate.ofEpochDay(ts / 1000000000L / 86400L)
    assert(reg.get(Metrics.ingestRowsDay(day)) === 2,
      s"per-day ingest counter for $day")
    // no stray day counters from a 2-row single-day batch
    assert(reg.snapshot().keys.count(_.startsWith("ingest.rows.day.")) === 1)
  }

  test("per-day ingest counters split rows across event days") {
    val reg = new MetricsRegistry
    val base = GraftTestSpark.tmpDir("metrics-days")
    val d0 = 1600000000L / 86400L * 86400L // midnight boundary, s
    val rows = Seq(d0 - 1, d0, d0 + 1, d0 + 86400L).map(s =>
      s"""{"consensusTimestamp":${s * 1000000000L},"transactionType":14}""")
    rows.toDF("value").coalesce(1).write.text(s"$base/in")
    val pipe = new IngestPipeline(spark,
      new TransactionsTable(spark, s"$base/transactions"),
      new ErrorsTable(spark, s"$base/errors"), reg = reg)
    val (ok, _) = pipe.ingestBatch(s"$base/in")
    assert(ok === 4)
    def dayOf(s: Long) = java.time.LocalDate.ofEpochDay(s / 86400L)
    assert(reg.get(Metrics.ingestRowsDay(dayOf(d0 - 1))) === 1)
    assert(reg.get(Metrics.ingestRowsDay(dayOf(d0))) === 2)
    assert(reg.get(Metrics.ingestRowsDay(dayOf(d0 + 86400L))) === 1)
  }

  test("dedupe job writes run counters and per-phase job metrics") {
    val reg = new MetricsRegistry
    val base = GraftTestSpark.tmpDir("metrics-dedupe")
    val table = new TransactionsTable(spark, s"$base/transactions")
    val t0 = 1600000000L * 1000000000L
    TestRows.writeDays(spark, table, Seq.tabulate(30)(i => t0 + i) ++ Seq(t0, t0 + 1))

    val job = new Deduplication.Job(spark, table,
      new StateStore(spark, s"$base/state"), reg = reg)
    val res = job.runIncremental()
    assert(res.duplicatesRemoved === 2)
    assert(reg.get(Metrics.DedupeInvocations) === 1)
    assert(reg.get(Metrics.DuplicatesCount) === 2)
    assert(reg.get(Metrics.DedupeStartTimestamp) > 0)
    assert(reg.get(Metrics.DedupeEndTimestamp) >= reg.get(Metrics.DedupeStartTimestamp))
    // per-phase job metrics under the reference's dedupe.job.* names
    assert(reg.snapshot().keys.exists(_.startsWith("dedupe.job.runtime.detect")))
    assert(reg.get("dedupe.job.rows.detect") === 2) // two duplicate groups
    assert(reg.snapshot().keys.exists(_.startsWith("dedupe.job.runtime.repair")))
    assert(reg.get("dedupe.job.rows.repair") === 2)
  }

  test("watermark-dropped late rows reach the LateRowsDropped counter") {
    // Late-row loss is the one streaming data-loss channel with no
    // dead-letter record; the listener must surface it. Plant a row two
    // minutes behind the advanced watermark and assert the counter moved
    // (and that on-time rows don't).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reg = new MetricsRegistry
    val listener = new Metrics.IngestListener(reg)
    spark.streams.addListener(listener)
    try {
      val ms = MemoryStream[(java.sql.Timestamp, String)]
      val counts = graft.streaming.StreamOps.tumblingCounts(
        ms.toDF().toDF("ts", "k"), "ts", "1 minute", Some("10 seconds"), "k")
      val q = counts.writeStream.format("memory").queryName("late_counts")
        .outputMode("append").start()
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      try {
        ms.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:05:00"), "a"))
        q.processAllAvailable() // watermark advances to 10:04:50
        assert(reg.get(Metrics.LateRowsDropped) === 0L)
        ms.addData((t("2024-01-01 10:02:30"), "late"))
        q.processAllAvailable()
        // listener events are async; processAllAvailable flushes progress
        // but the bus delivery can trail it
        val deadline = System.nanoTime() + 10_000_000_000L
        while (reg.get(Metrics.LateRowsDropped) == 0L && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(reg.get(Metrics.LateRowsDropped) === 1L)
      } finally q.stop()
    } finally spark.streams.removeListener(listener)
  }
}
