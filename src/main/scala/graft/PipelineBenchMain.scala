package graft

/** Standalone entry for the pipeline-rate benchmark (isolated JVM — query
  * bench heap state doesn't contaminate the measurement). */
object PipelineBenchMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localFromEnv("graft-pipebench")
    val r = PipelineBench.run(spark, sfDir)
    println(s"ingest_rows=${r.ingestRows} ingest_sec=${r.ingestSec} " +
      s"rows_per_sec=${r.ingestRowsPerSec.round} dedupe_sec=${r.dedupeSec} " +
      s"dups=${r.dedupeDuplicates} windowed_dedupe_sec=${r.windowedDedupeSec}")
    spark.stop()
  }
}
