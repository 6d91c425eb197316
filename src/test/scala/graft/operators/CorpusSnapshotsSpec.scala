package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The snapshot store's contract: committed versions are immutable and
  * monotone, diffs between versions report exactly what changed, a torn
  * commit (data written, marker missing) is invisible and reclaimed,
  * retention never drops the newest versions, and concurrent committers
  * get distinct versions. */
class CorpusSnapshotsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("commit / read round trip, versions monotone") {
    val dir = GraftTestSpark.tmpDir("snaps-rt")
    val v1 = CorpusSnapshots.commit(corpus(1L -> "a", 2L -> "b"), dir)
    val v2 = CorpusSnapshots.commit(corpus(1L -> "a", 2L -> "B", 3L -> "c"), dir)
    assert(v1 === 1 && v2 === 2)
    assert(CorpusSnapshots.versions(spark, dir) === Seq(1, 2))
    assert(CorpusSnapshots.latestVersion(spark, dir) === Some(2))
    val back = CorpusSnapshots.read(spark, dir, 1)
      .as[(Long, String)].collect().toSet
    assert(back === Set(1L -> "a", 2L -> "b"))
  }

  test("diff between versions reports added/removed/changed") {
    val dir = GraftTestSpark.tmpDir("snaps-diff")
    CorpusSnapshots.commit(corpus(1L -> "a", 2L -> "b", 4L -> "keep"), dir)
    CorpusSnapshots.commit(corpus(1L -> "a2", 3L -> "new", 4L -> "keep"), dir)
    val d = CorpusSnapshots.diff(spark, dir, 1, 2)
      .select(col("doc_id"), col("status")).as[(Long, String)].collect().toSet
    assert(d === Set((1L, "changed"), (2L, "removed"), (3L, "added")))
  }

  test("a torn commit is invisible and its number is reused after reclaim") {
    val dir = GraftTestSpark.tmpDir("snaps-torn")
    CorpusSnapshots.commit(corpus(1L -> "a"), dir)
    // simulate a crash after the data write but before the marker:
    // write v=2 data with no commits/2
    corpus(9L -> "torn").write.parquet(new Path(dir, "v=2").toString)
    assert(CorpusSnapshots.versions(spark, dir) === Seq(1))
    intercept[IllegalArgumentException] {
      CorpusSnapshots.read(spark, dir, 2)
    }
    // the next commit allocates 2, reclaims the orphan, and wins
    val v = CorpusSnapshots.commit(corpus(5L -> "real"), dir)
    assert(v === 2)
    assert(CorpusSnapshots.read(spark, dir, 2)
      .as[(Long, String)].collect().toSet === Set(5L -> "real"))
  }

  test("sweepOrphans removes marker-less data dirs only") {
    val dir = GraftTestSpark.tmpDir("snaps-sweep")
    CorpusSnapshots.commit(corpus(1L -> "a"), dir)
    corpus(9L -> "torn").write.parquet(new Path(dir, "v=7").toString)
    assert(CorpusSnapshots.sweepOrphans(spark, dir) === Seq(7))
    assert(CorpusSnapshots.versions(spark, dir) === Seq(1))
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(dir, "v=7")))
    assert(f.exists(new Path(dir, "v=1")))
  }

  test("retain keeps the newest versions and reports the dropped ones") {
    val dir = GraftTestSpark.tmpDir("snaps-retain")
    (1 to 4).foreach(i => CorpusSnapshots.commit(corpus(i.toLong -> s"v$i"), dir))
    assert(CorpusSnapshots.retain(spark, dir, keepLast = 2) === Seq(1, 2))
    assert(CorpusSnapshots.versions(spark, dir) === Seq(3, 4))
    intercept[IllegalArgumentException] { CorpusSnapshots.read(spark, dir, 1) }
    assert(CorpusSnapshots.read(spark, dir, 4)
      .as[(Long, String)].collect().toSet === Set(4L -> "v4"))
  }

  test("concurrent committers get distinct consecutive versions") {
    val dir = GraftTestSpark.tmpDir("snaps-race")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = (1 to 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = CorpusSnapshots.commit(corpus(i.toLong -> s"c$i"), dir)
        })
      }
      val got = tasks.map(_.get(600, java.util.concurrent.TimeUnit.SECONDS)).toSet
      assert(got === Set(1, 2))
      assert(CorpusSnapshots.versions(spark, dir) === Seq(1, 2))
    } finally pool.shutdownNow()
  }
}
