package graft

import org.apache.spark.sql.functions.{col, lit}

/** Dev A/B for the PageRank round-materialization interval: times the
  * bench's own `pagerank_sec` input (10 rounds over the doc-level near-dup
  * graph) at several `materializeEvery` settings, interleaved. 1 = the r12
  * per-round-checkpoint behavior; `iterations` = fully lazy.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PageRankAB [reps]"
  */
object PageRankAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.localFromEnv("graft-pagerank-ab")
    val pairs = graft.queries.TextQueries.benchJaccardPairs(spark, sfDir)
    val edges = pairs
      .union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .withColumn("w", lit(1L))
      .localCheckpoint(true)
    val nodes = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    def once(every: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.PageRank
        .ranks(nodes, "doc_id", edges, "a_id", "b_id", "w", 10, every)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val settings = Seq(1, 2, 4, 5)
    settings.foreach(once) // warmups
    val walls = scala.collection.mutable.Map[Int, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; s <- settings) walls(s) = walls(s) :+ once(s)
    settings.foreach { s =>
      val ws = walls(s)
      println(f"materializeEvery=$s%-3d median ${BenchUtil.median(ws)}%.3f  " +
        f"runs ${ws.map(w => f"$w%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
