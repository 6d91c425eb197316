package graft.sources

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("transaction_types dim from CSV seed matches the programmatic seed") {
    val fromCsv = Sources.transactionTypesDim(spark)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(fromCsv === graft.hedera.TransactionSchema.transactionTypes.sortBy(_._1))
    assert(fromCsv.size === 21)
  }

  test("text archive sink (K6): stream lands raw lines exactly once") {
    val dir = GraftTestSpark.tmpDir("textsink")
    new java.io.File(s"$dir/in").mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in/a.jsonl"),
      "{\"a\":1}\n{\"a\":2}\n")
    def runOnce(): Unit = {
      val q = Sources.streamJsonLines(spark, s"$dir/in")
        .writeStream.format("text")
        .option("path", s"$dir/archive")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    runOnce() // checkpoint: no duplicates on restart
    val archived = spark.read.text(s"$dir/archive").as[String].collect().sorted
    assert(archived.toSeq === Seq("{\"a\":1}", "{\"a\":2}"))
  }
}
