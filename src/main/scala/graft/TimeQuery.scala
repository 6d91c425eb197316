package graft

import graft.queries.Registry

/** Dev tool: wall-time registry queries by name (2 passes each — cold then
  * warm; the warm pass is the comparable number). Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.TimeQuery name1 name2
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localFromEnv("graft-timequery")
    args.foreach { n =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        Registry.byName(n).build(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"$n pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
