package graft.hedera

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, PipelineBench}

/** The single-shuffle ingest path (preDedupe = false, raw lines pre-keyed
  * by regex-extracted (day, salt)) must land EXACTLY the rows the classic
  * fan-out + layout path lands, and must keep the bounded-files-per-day
  * write layout even though the table-side layout exchange is skipped. */
class IngestLayoutSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("single-shuffle ingest: same rows as the typed transform, bounded files per day") {
    val base = GraftTestSpark.tmpDir("graft-ingest-layout")
    val inDir = s"$base/in"
    val nLines = PipelineBench.jsonCorpus(spark, GraftTestSpark.sfDir, inDir)

    val table = new TransactionsTable(spark, s"$base/tx")
    val errors = new ErrorsTable(spark, s"$base/errors")
    val pipe = new IngestPipeline(spark, table, errors, preDedupe = false)
    val (ok, bad) = pipe.ingestBatch(inDir)
    assert(ok === nLines && bad === 0L)

    // content parity: the landed table IS the typed transform of the corpus
    val expected = TransactionTransform.parse(spark.read.text(inDir))._1
    val got = table.read()
    assert(got.count() === nLines)
    assert(got.except(expected).count() === 0L)
    assert(expected.except(got).count() === 0L)

    // bounded layout: each day= partition holds at most filesPerDay files
    val dayDirs = new File(s"$base/tx").listFiles().filter(_.getName.startsWith("day="))
    assert(dayDirs.nonEmpty)
    dayDirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files <= table.filesPerDay,
        s"${d.getName}: $files files > bound ${table.filesPerDay}")
    }
  }
}
