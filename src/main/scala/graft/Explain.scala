package graft

import graft.queries.Registry

/** Plan inspector: prints the formatted physical plan for the named queries
  * (or all headline queries) at a given scale dir. The tuning loop's main
  * tool — check PushedFilters reach the scan, joins broadcast where a side
  * is small, WholeStageCodegen spans are wide, and no shuffle appears that
  * the query doesn't need.
  *
  * `--exec` first runs each query through the noop sink and then prints the
  * FINAL adaptive plan: AQE's runtime decisions (shuffle→broadcast
  * conversion, partition coalescing, skew splits) only exist in the
  * executed plan, so the static explain under-reports what actually ran.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val exec = args.contains("--exec")
    val names0 = args.filterNot(_ == "--exec").toSeq
    val names = if (names0.nonEmpty) names0 else Registry.headline.map(_.name)
    val spark = GraftSession.localFromEnv("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = Registry.byName(n).build(spark, sfDir)
      if (exec) {
        // Drive THIS DataFrame's own QueryExecution (a sink write would plan
        // and execute a separate command QueryExecution, leaving df's
        // AdaptiveSparkPlan unexecuted with isFinalPlan=false).
        df.queryExecution.toRdd.foreach(_ => ())
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
