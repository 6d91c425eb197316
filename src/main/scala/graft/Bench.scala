package graft

import graft.queries.Registry

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced end-to-end through the noop
  * sink (full plan execution — a bare count() could collapse to metadata),
  * run twice, best-of reported (first run pays file-listing/JIT warmup the
  * same way every engine's hot path would not).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localFromEnv("graft-bench")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      Registry.byName(name).build(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Pipeline rates vs BASELINE.md targets (ingest throughput; one
    // incremental dedupe well inside the 5-min schedule). Measured before
    // the query loop: a heap full of query-stage leftovers was observed to
    // degrade the write-heavy pipeline measurement several-fold.
    val rates = try PipelineBench.run(spark, sfDir)
    catch { case _: Throwable => PipelineBench.Rates(0, -1, -1, -1, 0) }

    val results = Registry.headline.map { q =>
      val t = try math.min(runOnce(q.name), runOnce(q.name))
      catch { case _: Throwable => -1.0 }
      q.name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""ingest_rows":${rates.ingestRows},""" +
      s""""ingest_rows_per_sec":${rates.ingestRowsPerSec.round},""" +
      s""""dedupe_incremental_sec":${rates.dedupeSec},""" +
      s""""dedupe_duplicates_removed":${rates.dedupeDuplicates},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
