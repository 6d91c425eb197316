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
          f"funnel_state_rows=${s.funnelStateRows} funnel_out_rows=${s.funnelOutRows} " +
          f"attribution_batches=${s.attributionBatches} " +
          f"attribution_p50=${s.attributionP50Sec}%.3f " +
          f"attribution_p95=${s.attributionP95Sec}%.3f " +
          f"attribution_state_rows=${s.attributionStateRows} " +
          f"attribution_out_rows=${s.attributionOutRows} " +
          f"attribution_parity=${s.attributionParity}")
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
        // The SCALE-HONEST recall instrument (VERDICT r10 #4) at the SHIPPED
        // operating point (VERDICT r11 #1): production sizing is
        // `nCentroids ≈ √n` (IvfIndex.prodConfig) + a MEASURED probe width —
        // calibrateNProbe walks the dial until recall@10 clears 0.8 on the
        // standing index, so the record carries the chosen point's cost
        // (search wall at the calibrated nProbe) next to the recall it
        // actually delivers. recall_probe8 keeps the old fixed-width
        // reading so the round-over-round series stays comparable.
        import org.apache.spark.sql.functions.col
        val dir = java.nio.file.Files.createTempDirectory("graft-ivfp-sb").toString
        try {
          val emb = Tables.load(spark, sfDir, "embeddings")
          val n = emb.count()
          val cfg = graft.similarity.IvfIndex.prodConfig(n)
          val tb = System.nanoTime()
          graft.similarity.IvfIndex.build(emb, "vec_id", "embedding", dir, cfg)
          val build = (System.nanoTime() - tb) / 1e9
          val queries = emb.filter(col("vec_id") < 100)
          def once(np: Int): Double = {
            val t0 = System.nanoTime()
            graft.similarity.IvfIndex
              .searchIndex(queries, dir, "vec_id", "embedding", 10, np)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once(8)
          val search8 = once(8)
          val recall8 = graft.similarity.IvfIndex.recallEstimate(spark, dir)
          val tc = System.nanoTime()
          val (np, recall) = graft.similarity.IvfIndex.calibrateNProbe(spark, dir)
          val calib = (System.nanoTime() - tc) / 1e9
          val search = once(np)
          println(f"ivfprod n=$n cells=${cfg.nCentroids} build_sec=$build%.3f " +
            f"search_probe8_sec=$search8%.3f recall_probe8=$recall8%.3f " +
            f"calibrated_nprobe=$np calibrated_recall=$recall%.3f " +
            f"calibrate_sec=$calib%.3f search_calibrated_sec=$search%.3f")
        } finally BenchUtil.deleteRecursively(new java.io.File(dir))
      case "retrievalappend" =>
        // Append-path decade loop (VERDICT r11 #5): build on the even doc
        // ids, then ONE appendDocs of the odd half — run with
        // GRAFT_RINDEX_TIMING=1 to attribute the wall to the subtable
        // steps (append:tf / dlen / df / ndocs / ntokens).
        import org.apache.spark.sql.functions.col
        val dir = java.nio.file.Files.createTempDirectory("graft-rapp-sb").toString
        try {
          val docs = Tables.load(spark, sfDir, "documents")
          graft.retrieval.RetrievalIndex.build(
            docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", dir)
          val t0 = System.nanoTime()
          graft.retrieval.RetrievalIndex.appendDocs(
            docs.filter(col("doc_id") % 2 =!= 0), dir, "doc_id", "text")
          println(f"retrievalappend append_sec=${(System.nanoTime() - t0) / 1e9}%.3f")
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
          "(stream | joinskew | retrieval | ivf | retrievaldel | ivfprod | " +
          "ivfcurve | retrievalappend)")
    }
    spark.stop()
  }
}
