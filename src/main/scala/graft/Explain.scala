package graft

import graft.queries.Registry

/** Plan inspector: prints the formatted physical plan for the named queries
  * (or all headline queries) at a given scale dir. The tuning loop's main
  * tool — check PushedFilters reach the scan, joins broadcast where a side
  * is small, WholeStageCodegen spans are wide, and no shuffle appears that
  * the query doesn't need.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Registry.headline.map(_.name)
    val spark = GraftSession.localFromEnv("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
