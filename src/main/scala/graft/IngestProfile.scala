package graft

import org.apache.spark.sql.functions._
import graft.hedera._

/** Stage-by-stage ingest cost breakdown on the bench corpus: isolates the
  * text scan, the lenient from_json parse, the castToSchema projection, and
  * the full day-partitioned write, so throughput work targets the actual
  * kernel instead of a guess. Each stage is forced through the noop sink.
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localFromEnv("graft-ingest-profile")
    val base = java.nio.file.Files.createTempDirectory("graft-profile").toString
    val rows = PipelineBench.jsonCorpus(spark, sfDir, s"$base/in")

    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $s%8.2f s  ${rows / s}%9.0f rows/s")
    }

    val raw = spark.read.text(s"$base/in")
      .repartition(spark.sparkContext.defaultParallelism)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    timed("scan text")(noop(raw))
    timed("scan text (2nd)")(noop(raw))
    timed("+ from_json parse")(noop(TransactionTransform.parseRaw(raw)))
    timed("+ castToSchema project")(noop(
      TransactionTransform.typedRows(TransactionTransform.parseRaw(raw))))
    timed("+ parquet write (full)") {
      val table = new TransactionsTable(spark, s"$base/transactions")
      val errors = new ErrorsTable(spark, s"$base/errors")
      new IngestPipeline(spark, table, errors, preDedupe = false).ingestBatch(s"$base/in")
    }
    timed("+ parquet write (no coalesce)") {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try {
        val table = new TransactionsTable(spark, s"$base/transactions2")
        val errors = new ErrorsTable(spark, s"$base/errors2")
        new IngestPipeline(spark, table, errors, preDedupe = false).ingestBatch(s"$base/in")
      } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }
    spark.stop()
  }
}
