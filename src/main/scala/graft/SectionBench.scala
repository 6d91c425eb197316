package graft

/** Standalone entry for individual bench sections (isolated JVM, quiet-host
  * adjudication of section-metric regressions — the TimeQuery protocol's
  * sibling for the non-query sections). Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.SectionBench stream
  *   SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.SectionBench joinskew
  */
object SectionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localFromEnv("graft-sectionbench")
    args.foreach {
      case "stream" =>
        val s = StreamBench.run(spark, sfDir)
        println(s"stream rows=${s.rows} batches=${s.batches} " +
          f"p50=${s.batchP50Sec}%.3f p95=${s.batchP95Sec}%.3f " +
          f"first=${s.firstBatchSec}%.3f steady_p50=${s.steadyP50Sec}%.3f " +
          f"steady_p95=${s.steadyP95Sec}%.3f rows_per_sec=${s.rowsPerSec}%.0f " +
          f"dedupe_quiet=${s.quietDedupeSec}%.3f dedupe_concurrent=${s.concurrentDedupeSec}%.3f " +
          f"sat_offered_rps=${s.satOfferedRps}%.0f sat_p95=${s.satP95Sec}%.3f " +
          f"backlog_recovery=${s.satRecoverySec}%.3f " +
          f"funnel_rows=${s.funnelRows} funnel_batches=${s.funnelBatches} " +
          f"funnel_p50=${s.funnelP50Sec}%.3f funnel_p95=${s.funnelP95Sec}%.3f " +
          f"funnel_state_rows=${s.funnelStateRows} funnel_out_rows=${s.funnelOutRows}")
      case "joinskew" =>
        val js = GenSkew.benchJoinSkew(spark, sfDir)
        println(f"joinskew q3_uniform=${js.q3Uniform}%.3f q3_skew=${js.q3Skew}%.3f " +
          f"q3_ratio=${js.q3Skew / js.q3Uniform}%.2f " +
          f"wrank_uniform=${js.wrankUniform}%.3f wrank_skew=${js.wrankSkew}%.3f " +
          f"wrank_ratio=${js.wrankSkew / js.wrankUniform}%.2f")
      case "retrieval" =>
        // RetrievalIndex lifecycle at whatever SF the dir holds — the sf10
        // spot-run path (Bench measures the same lifecycle at the round SF).
        // build_cold_sec includes this JVM's whole JIT/codegen ramp (~5 s
        // flat across SFs); build_sec is a second full build in the warm
        // JVM — the number decade multipliers must be read from.
        val dir = java.nio.file.Files.createTempDirectory("graft-rindex-sb").toString
        val dir2 = java.nio.file.Files.createTempDirectory("graft-rindex-sb2").toString
        try {
          val docs = Tables.load(spark, sfDir, "documents")
          def buildOnce(d: String): Double = {
            val tb = System.nanoTime()
            graft.retrieval.RetrievalIndex.build(docs, "doc_id", "text", d)
            (System.nanoTime() - tb) / 1e9
          }
          val cold = buildOnce(dir)
          val warm = buildOnce(dir2)
          def once(): Double = {
            val t0 = System.nanoTime()
            graft.retrieval.RetrievalIndex.scoreBm25(spark, dir,
                graft.retrieval.RetrievalIndex.topTerms(spark, dir, 3))
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once()
          println(f"retrieval build_sec=$warm%.3f build_cold_sec=$cold%.3f " +
            f"score_sec=${once()}%.3f")
        } finally {
          BenchUtil.deleteRecursively(new java.io.File(dir))
          BenchUtil.deleteRecursively(new java.io.File(dir2))
        }
      case "ivf" =>
        import org.apache.spark.sql.functions.col
        val dir = java.nio.file.Files.createTempDirectory("graft-ivf-sb").toString
        try {
          val emb = Tables.load(spark, sfDir, "embeddings")
          val tb = System.nanoTime()
          graft.similarity.IvfIndex.build(emb, "vec_id", "embedding", dir)
          val build = (System.nanoTime() - tb) / 1e9
          val queries = emb.filter(col("vec_id") < 100)
          def once(): Double = {
            val t0 = System.nanoTime()
            graft.similarity.IvfIndex.searchIndex(queries, dir, "vec_id", "embedding", 10)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once()
          val search = once()
          val recall = graft.similarity.IvfIndex.recallEstimate(spark, dir)
          println(f"ivf build_sec=$build%.3f search_sec=$search%.3f recall_at_10=$recall%.3f")
        } finally BenchUtil.deleteRecursively(new java.io.File(dir))
      case "retrievaldel" =>
        // Deletion lifecycle at scale: tombstone 10% of the corpus
        // (O(batch) — the ids parquet write), then the compaction that
        // applies it (one postings pass + stats re-derivation).
        import org.apache.spark.sql.functions.col
        val dir = java.nio.file.Files.createTempDirectory("graft-rdel-sb").toString
        try {
          val docs = Tables.load(spark, sfDir, "documents")
          graft.retrieval.RetrievalIndex.build(docs, "doc_id", "text", dir)
          val t0 = System.nanoTime()
          graft.retrieval.RetrievalIndex.deleteDocs(
            docs.filter(col("doc_id") % 10 === 0).select(col("doc_id")), dir, "doc_id")
          val del = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val scored = {
            graft.retrieval.RetrievalIndex.scoreBm25(spark, dir,
                graft.retrieval.RetrievalIndex.topTerms(spark, dir, 3))
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t1) / 1e9
          }
          val t2 = System.nanoTime()
          graft.retrieval.RetrievalIndex.compact(spark, dir)
          val compact = (System.nanoTime() - t2) / 1e9
          println(f"retrievaldel delete_sec=$del%.3f " +
            f"tombstoned_score_sec=$scored%.3f compact_sec=$compact%.3f")
        } finally BenchUtil.deleteRecursively(new java.io.File(dir))
      case "ivfprod" =>
        // The SCALE-HONEST recall instrument (VERDICT r10 #4): the default
        // 16-cell/probe-8 config scans half the corpus per query, so its
        // recall saturates at 1.0 the moment neighbor clusters fit in a
        // cell — it measures nothing at 500 k vectors. Production sizing
        // (nCentroids ≈ √n, the FAISS-family rule; nProbe stays 8) makes
        // the probed fraction shrink with scale, so the reading tracks the
        // QUANTIZER against the perturbed replica geometry.
        import org.apache.spark.sql.functions.col
        val dir = java.nio.file.Files.createTempDirectory("graft-ivfp-sb").toString
        try {
          val emb = Tables.load(spark, sfDir, "embeddings")
          val n = emb.count()
          val cells = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
          val cfg = graft.similarity.IvfIndex.Config(
            nCentroids = cells, sampleSize = math.max(800, 8 * cells))
          val tb = System.nanoTime()
          graft.similarity.IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
          val build = (System.nanoTime() - tb) / 1e9
          val queries = emb.filter(col("vec_id") < 100)
          def once(): Double = {
            val t0 = System.nanoTime()
            graft.similarity.IvfIndex.searchIndex(queries, dir, "vec_id", "embedding", 10)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once()
          val search = once()
          val recall = graft.similarity.IvfIndex.recallEstimate(spark, dir)
          println(f"ivfprod n=$n cells=$cells build_sec=$build%.3f " +
            f"search_sec=$search%.3f recall_at_10=$recall%.3f")
        } finally BenchUtil.deleteRecursively(new java.io.File(dir))
      case "ivfcurve" =>
        // Recall-vs-cost OPERATING CURVE at production sizing (VERDICT r11
        // #1): one √n-cell build, then sweep the nProbe dial, printing
        // recall@10 + the measured search wall + the scanned fraction at
        // each point — the dial table a user reads to pick a target-recall
        // operating point (recorded per-SF in SCALING.md). For plain IVF
        // the in-cell scores are already exact cosines, so nProbe is THE
        // recall dial — a widened-shortlist rerank (the e_knn_bq pattern)
        // only helps quantized-score variants.
        import org.apache.spark.sql.functions.col
        val dir = java.nio.file.Files.createTempDirectory("graft-ivfc-sb").toString
        try {
          val emb = Tables.load(spark, sfDir, "embeddings")
          val n = emb.count()
          val cells = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
          val cfg = graft.similarity.IvfIndex.Config(
            nCentroids = cells, sampleSize = math.max(800, 8 * cells))
          graft.similarity.IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
          val queries = emb.filter(col("vec_id") < 100)
          def once(np: Int): Double = {
            val t0 = System.nanoTime()
            graft.similarity.IvfIndex
              .searchIndex(queries, dir, "vec_id", "embedding", 10, np)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once(8) // warm: listing + codegen
          Seq(1, 2, 4, 8, 16, 32, 64, 128, 256).filter(_ <= cells).foreach { np =>
            val s = once(np)
            val r = graft.similarity.IvfIndex.recallEstimate(spark, dir, 10, 64, np)
            println(f"ivfcurve n=$n cells=$cells nprobe=$np " +
              f"recall_at_10=$r%.3f search_sec=$s%.3f " +
              f"scan_frac=${np.toDouble / cells}%.4f")
          }
        } finally BenchUtil.deleteRecursively(new java.io.File(dir))
      case other =>
        sys.error(s"unknown section '$other' " +
          "(stream | joinskew | retrieval | ivf | retrievaldel | ivfprod | ivfcurve)")
    }
    spark.stop()
  }
}
