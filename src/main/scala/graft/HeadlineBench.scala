package graft

import graft.queries.Registry

/** Dev tool: the bench's headline-query loop in isolation — identical
  * methodology (noop sink, one untimed warmup, median of 3 timed runs) so
  * optimization A/Bs measure what BENCH_rN will see without paying the full
  * Bench run. Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.HeadlineBench [names...]
  */
object HeadlineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localFromEnv("graft-headline-bench")
    val names = if (args.nonEmpty) args.toSeq else Registry.headline.map(_.name)
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      Registry.byName(name).build(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val meds = names.map { n =>
      runOnce(n) // warmup
      val walls = Seq.fill(3)(runOnce(n))
      val med = BenchUtil.median(walls)
      println(f"$n%-22s median $med%.3f  runs ${walls.map(w => f"$w%.3f").mkString(" ")}")
      med
    }
    println(f"TOTAL ${meds.sum}%.3f")
    spark.stop()
  }
}
