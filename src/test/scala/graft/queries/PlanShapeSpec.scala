package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The 100 TB design properties are PLAN properties — pin them as tests so
  * a regression that keeps results correct but wrecks the scale shape
  * (a filter that stops pushing, a dimension that stops broadcasting, a
  * top-N that becomes a global sort, a join that degrades to a cartesian)
  * fails the suite, not just the bench.
  *
  * The whole battery runs against the test scale factor, and AGAIN against
  * the locally generated sf1 corpus when present (tools: `graft.GenScale`)
  * — one order of magnitude of scale evidence that the shapes hold as
  * file-size statistics grow (broadcasts must not silently flip to
  * shuffle joins, pushdown must survive bigger row groups).
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private val sf1Dir = "/root/repo/testdata-sf1"
  private val dirs: Seq[(String, String)] =
    Seq("" -> GraftTestSpark.sfDir) ++
      (if (new java.io.File(sf1Dir).isDirectory) Seq(" [sf1]" -> sf1Dir) else Nil)

  // Memoized: the full-registry sweep and the targeted tests revisit the
  // same plans; queries composing ConnectedComponents even run their
  // iterative job at build time, so each (dir, query) builds exactly once.
  private val planCache = scala.collection.mutable.Map.empty[(String, String), String]
  private def plan(dir: String, name: String): String =
    planCache.getOrElseUpdate((dir, name),
      Registry.byName(name).build(spark, dir)
        .queryExecution.executedPlan.toString)

  for ((tag, dir) <- dirs) {

    test(s"filters reach the parquet scans (pushdown)$tag") {
      Seq("q1_pricing", "q3_shipping", "q5_region_rev").foreach { q =>
        val p = plan(dir, q)
        assert(p.contains("PushedFilters: [Is") || p.contains("PushedFilters: [Equal"),
          s"$q: no pushed filters in\n$p")
      }
    }

    test(s"derived-time window bounds reach the events scan (DerivedTimeFilterPushdown)$tag") {
      // the window predicate is written on the DERIVED µs image (ts div
      // 1000); the optimizer rule must recover raw-column bounds the
      // parquet reader can prune row groups with — for BOTH physical forms
      // of ts (timestamp at the test sf, ns long in GenScale output)
      val p = plan(dir, "h_filter_window")
      assert(p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThanOrEqual(ts,"),
        s"h_filter_window: derived window not pushed to the scan:\n$p")
    }

    test(s"no query plans a cartesian or nested-loop join except the brute-force baselines$tag") {
      val exempt = Set("e_cosine_topk", "e_label_stats", "e_dup_pairs_exact") ++
        // CC-composed queries EXECUTE their iterative fixpoint at build time
        // (minutes at sf1); their constituent shapes are still pinned at
        // sf1 — the edge computation via t_jaccard_pairs here, the label
        // rounds are id-keyed equi-joins by construction
        // (ConnectedComponentsSpec covers semantics).
        (if (dir == sf1Dir)
           Set("t_dup_clusters", "t_split_leakfree", "t_minhash_dedup",
             "t_best_of_cluster", "t_dup_clusters_incremental",
             "t_source_pagerank", "e_top_pc", "e_whiten_topk",
             "t_cluster_keywords")
         else Set.empty[String])
      Registry.all.filterNot(q => exempt(q.name)).foreach { q =>
        val p = plan(dir, q.name)
        assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian join")
      }
    }

    test(s"dimension joins broadcast (q5 star chain, type decode)$tag") {
      assert(plan(dir, "q5_region_rev").contains("BroadcastHashJoin"))
      assert(plan(dir, "h_type_decode").contains("BroadcastHashJoin"))
    }

    test(s"bounded side tables broadcast (mix bucket offsets, trigram model)$tag") {
      // t_mix_sample's bucket-offset frame is sources×256 rows; the
      // trigram "model" is alphabet-bounded (≤ |Σ|³) — at ANY corpus size
      // these joins must stay map-side, never shuffle the corpus.
      assert(plan(dir, "t_mix_sample").contains("BroadcastHashJoin"),
        "t_mix_sample: bucket offsets must broadcast")
      assert(plan(dir, "t_trigram_lm").contains("BroadcastHashJoin"),
        "t_trigram_lm: the trigram count table must broadcast")
    }

    test(s"top-N queries avoid a global sort (TakeOrderedAndProject)$tag") {
      Seq("q_sort_limit", "q3_shipping", "e_cosine_topk").foreach { q =>
        assert(plan(dir, q).contains("TakeOrderedAndProject"),
          s"$q: top-N should be TakeOrderedAndProject, not a global sort")
      }
    }

    test(s"column pruning: q1 scans only the aggregated lineitem columns$tag") {
      val p = plan(dir, "q1_pricing")
      val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      // columns not in the aggregate are pruned at the scan. (The spread
      // key — l_orderkey, l_linenumber — legitimately joins the ReadSchema
      // when the layout-adaptive spread fires on a degenerate layout;
      // l_partkey/l_suppkey must stay pruned in every configuration.)
      assert(readSchema.contains("l_returnflag") && !readSchema.contains("l_partkey")
        && !readSchema.contains("l_suppkey"),
        s"unexpected ReadSchema: $readSchema")
    }

    test(s"similarity join shuffles band keys, not a cross product$tag") {
      val p = plan(dir, "e_knn_lsh")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "LSH knn must stay an equi-join on band keys")
    }

    test(s"retrieval family: aggregate shapes, no window sorts$tag") {
      // t_tfidf / t_bm25 are pure partial-agg group-by/join pipelines; a
      // window creeping in would shuffle-and-sort the whole doc-term
      // relation. t_text_knn's and the portable ANN twins' per-query top-k
      // must stay the TopKByScore bounded-heap aggregate
      // (ObjectHashAggregate with a partial phase), never a window sort.
      Seq("t_tfidf", "t_bm25").foreach { q =>
        val p = plan(dir, q)
        assert(!p.contains("Window"), s"$q must not use a window")
        assert(p.contains("HashAggregate"), s"$q should partial-aggregate")
      }
      Seq("t_text_knn", "e_knn_lsh_portable").foreach { q =>
        val p = plan(dir, q)
        assert(p.contains("ObjectHashAggregate"),
          s"$q top-k should be the bounded-heap aggregate:\n$p")
        assert(!p.contains("Window"), s"$q must not fall back to a window sort")
      }
      // t_bm25's 3-row query-term set must ride a broadcast join
      assert(plan(dir, "t_bm25").contains("BroadcastHashJoin"),
        "t_bm25: the query-term set must broadcast")
    }

    test(s"late-wave shapes: scoped ADC, single-pass featurizer, histogram window above the aggregate$tag") {
      // e_ivfpq_topk: the LUT/codebook joins are map-side and the top-k
      // never global-sorts — the candidate scoping must not change the
      // plain-PQ plan family
      val ipq = plan(dir, "e_ivfpq_topk")
      assert(ipq.contains("BroadcastHashJoin"), s"ivf-pq: LUT must broadcast:\n$ipq")
      assert(ipq.contains("TakeOrderedAndProject"),
        "ivf-pq: top-k must be TakeOrderedAndProject")
      // t_hashing_tf: the vocabulary-free featurizer is ONE partial
      // aggregate over the token explode — no join anywhere, no window
      val htf = plan(dir, "t_hashing_tf")
      assert(htf.contains("HashAggregate") && !htf.contains("Window") &&
        !htf.contains("Join"), s"hashing-tf must be a pure aggregate:\n$htf")
      // t_quantile_hist: the cumulative window must sit ABOVE the value
      // histogram's hash aggregate (the corpus-sized op is the partial-agg
      // count; the window sorts only the aggregated histogram)
      val qh = plan(dir, "t_quantile_hist")
      assert(qh.contains("HashAggregate") && qh.contains("Window"),
        s"quantile-hist shape drifted:\n$qh")
      // e_kmeans's final assignment: broadcast centroid array, no
      // sort-merge join, no window anywhere in the assembled plan
      val km = plan(dir, "e_kmeans")
      assert(!km.contains("SortMergeJoin") && !km.contains("Window"),
        s"kmeans assignment must stay a broadcast map:\n$km")
    }

    test(s"rank-ensemble filter: CDFs broadcast back onto the probe scan$tag") {
      // t_quality_ensemble's corpus-sized ops are one signal scan and one
      // partial-aggregable (signal, bucket) count; the three cumulative-
      // distribution frames (≤4096 rows each) must BROADCAST onto the
      // probe side — a sort-merge join here means the corpus is being
      // shuffled by bucket, and a missing Window means the CDF stopped
      // being cumulative.
      val qe = plan(dir, "t_quality_ensemble")
      assert("BroadcastHashJoin".r.findAllIn(qe).size >= 3,
        s"quality-ensemble: the three CDF joins must broadcast:\n$qe")
      assert(!qe.contains("SortMergeJoin"),
        s"quality-ensemble: corpus must not shuffle on the bucket key:\n$qe")
      assert(qe.contains("HashAggregate") && qe.contains("Window"),
        s"quality-ensemble: histogram/CDF shape drifted:\n$qe")
    }

    test(s"span dedup: equi-join on gram hashes, explode below the spread exchange$tag") {
      Seq("t_dup_spans", "t_dup_spans_anchored", "t_substring_dedup").foreach { q =>
        val p = plan(dir, q)
        assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
          s"$q: gram duplicate detection must stay an equi-join on the hash")
        assert(p.contains("Generate"), s"$q: position explode missing")
        assert(p.contains("HashAggregate"), s"$q: dup-hash count should partial-aggregate")
        // The ~len× exploded rows carry the document text; they must never
        // cross an exchange (the spread repartition sits BELOW the
        // generator). Every Generate in the plan must therefore have its
        // exchange before it top-down: assert no Exchange directly consumes
        // a Generate output by checking the formatted tree never nests
        // Generate as an Exchange child pattern "Exchange ... +- Generate".
        assert(!p.matches("(?s).*Exchange[^\\n]*\\n\\s*\\+- Generate.*"),
          s"$q: exploded text-carrying rows cross an exchange:\n$p")
      }
    }

    test(s"persisted retrieval index: scoring reads the index, not the corpus text$tag") {
      // t_bm25_indexed's final frame scores from the standing index: the
      // plan must scan the rindex work dir (tf/df/dlen/stats parquet) and
      // broadcast the 3-term query set; re-tokenizing the corpus at score
      // time would surface as an explode over the documents scan.
      val p = plan(dir, "t_bm25_indexed")
      assert(p.contains("graft-rindex"),
        s"t_bm25_indexed must scan the persisted index:\n$p")
      assert(!p.toLowerCase.contains("generate"),
        "t_bm25_indexed must not re-explode text at score time")
      assert(p.contains("BroadcastHashJoin"),
        "t_bm25_indexed: the query-term set must broadcast")
      assert(!p.contains("Window") && p.contains("HashAggregate"))
    }

    test(s"text knn API: query side broadcasts under the guard, shuffle-hash past it$tag") {
      val d = graft.Tables.load(spark, dir, "documents")
      val qs = d.filter(org.apache.spark.sql.functions.col("doc_id") < 5)
        .select(org.apache.spark.sql.functions.col("doc_id").as("query_id"),
          org.apache.spark.sql.functions.col("text"))
      val small = graft.retrieval.TextSearch.knn(qs, d, 3)
        .queryExecution.executedPlan.toString
      assert(small.contains("BroadcastHashJoin"),
        s"small query side must broadcast:\n$small")
      val forced = graft.retrieval.TextSearch.knn(qs, d, 3, maxBroadcastShingles = 0L)
        .queryExecution.executedPlan.toString
      assert(forced.contains("ShuffledHashJoin"),
        s"past the cap the query side must fall back to shuffle-hash:\n$forced")
    }

    test(s"cms heavy hitters: bounded sketch broadcasts, stream partial-aggregates$tag") {
      // the sketch is ≤ depth·width rows BY CONSTRUCTION — the one frame
      // whose broadcast needs no census guard; the build must stay a
      // map-side-combining aggregate (state is the 4096-cell grid, never
      // the vocabulary), and no window may creep into the threshold step
      val p = plan(dir, "t_heavy_hitters_cms")
      assert(p.contains("BroadcastHashJoin"), s"sketch must broadcast:\n$p")
      assert(p.contains("HashAggregate"), "sketch build should partial-aggregate")
      assert(!p.contains("Window"), "no window in the sketch pipeline")
    }

    test(s"r9 tail wave: MMR/matryoshka stay bounded-heap aggregates, z-key is a pure map, eval metrics broadcast the discount table$tag") {
      // e_mmr_topk: shortlist AND greedy selection are both
      // TypedImperativeAggregates — one groupBy exchange each, never a
      // window sort; the only join is the broadcast of the 8-row query set
      val mmr = plan(dir, "e_mmr_topk")
      assert(mmr.contains("ObjectHashAggregate"),
        s"mmr: shortlist/selection must be bounded-heap aggregates:\n$mmr")
      assert(!mmr.contains("Window") && !mmr.contains("SortMergeJoin"),
        s"mmr plan drifted:\n$mmr")
      // e_matryoshka_topk: both stages' top-k are the bounded-heap
      // aggregate; stage 2's vector attach is an id equi-join
      val mk = plan(dir, "e_matryoshka_topk")
      assert(mk.contains("ObjectHashAggregate") && !mk.contains("Window"),
        s"matryoshka top-k must stay aggregate-shaped:\n$mk")
      // q_zorder_key: one lineitem scan + a 1-row stats broadcast + a pure
      // per-row key map — no shuffle of the data, no window, no sort
      val zk = plan(dir, "q_zorder_key")
      assert(!zk.contains("SortMergeJoin") && !zk.contains("Window") &&
        !zk.contains("ShuffledHashJoin"),
        s"z-order key must not shuffle the table:\n$zk")
      // e_eval_metrics: the k-row discount table must broadcast; qrels-side
      // windows are queries*k-sized by construction
      val ev = plan(dir, "e_eval_metrics")
      assert(ev.contains("BroadcastHashJoin"),
        s"eval metrics: discount table must broadcast:\n$ev")
      // t_source_overlap: the corpus-sized op is a partial-aggregable
      // distinct; the pair join is an equi-join on the shingle key
      val so = plan(dir, "t_source_overlap")
      assert(so.contains("HashAggregate") && !so.contains("Window"),
        s"source overlap must stay aggregate-shaped:\n$so")
    }

    test(s"r10 tail wave: BQ/hybrid cut via TakeOrdered, ccnet thresholds broadcast, vocab growth partial-aggregates$tag") {
      // e_knn_bq: the hamming shortlist must be TakeOrderedAndProject —
      // constant memory per partition, never a corpus-wide Sort
      val bq = plan(dir, "e_knn_bq")
      assert(bq.contains("TakeOrderedAndProject"),
        s"e_knn_bq: shortlist must be TakeOrderedAndProject:\n$bq")
      // t_hybrid_rrf: BOTH legs cut to 50 via TakeOrdered before any
      // window; the rank windows and the fusion join run on 50-row frames
      val hy = plan(dir, "t_hybrid_rrf")
      assert(hy.contains("TakeOrderedAndProject"),
        s"t_hybrid_rrf: leg cuts must be TakeOrderedAndProject:\n$hy")
      // t_ccnet_buckets: the 5-row tercile threshold frame must broadcast
      // back onto the scored stream (a shuffle join here would resort the
      // corpus by lang); the trigram model broadcast is pinned separately
      val cc = plan(dir, "t_ccnet_buckets")
      assert(cc.contains("BroadcastHashJoin"),
        s"t_ccnet_buckets: threshold stamp must broadcast:\n$cc")
      // t_vocab_growth: term collapse is a partial min aggregate (the
      // combiner does the work map-side), not a distinct + window
      val vg = plan(dir, "t_vocab_growth")
      assert(vg.contains("partial_min") && !vg.contains("SortMergeJoin"),
        s"t_vocab_growth: first-doc collapse must partial-aggregate:\n$vg")
      // t_collocations: both count shuffles partial-aggregate; the unigram
      // attach stays a broadcast under the guard at test scales
      val co = plan(dir, "t_collocations")
      assert(co.contains("BroadcastHashJoin") && co.contains("partial_count"),
        s"t_collocations: unigram side must broadcast, counts partial-agg:\n$co")
    }

    test(s"r10 positional/graph wave: funnel and SCD2 ride one user exchange, postings legs equi-join$tag") {
      // organic exchanges only: the loader's layout-adaptive spread
      // (Tables.loadSpread r12) is not a plan regression — excluded by its
      // EXACT signature, `hashpartitioning(xxhash64(…))` (a bare
      // "xxhash64" match would also mask a genuine regression that merely
      // partitions on an xxhash64-derived column — ADVICE r12).
      def exchanges(p: String): Int =
        p.linesIterator.count(l => l.contains("Exchange ") &&
          !l.contains("ReusedExchange") &&
          !l.contains("hashpartitioning(xxhash64("))
      // q_funnel: four chained stage windows share ONE hashpartitioning
      // (user_id) exchange; only the global stage-count rollup adds its
      // single-partition exchange. A per-stage self-join cascade would
      // show up as extra exchanges/joins here.
      val fu = plan(dir, "q_funnel")
      assert(fu.contains("hashpartitioning(user_id") && exchanges(fu) <= 2
        && !fu.contains("Join"),
        s"q_funnel: must be windows on one user exchange + global rollup:\n$fu")
      // q_scd2_runs: lag-flag window, island agg (user_id ⊆ key) and the
      // valid_to lead all satisfy their distribution from the SAME
      // exchange — exactly one.
      val sc = plan(dir, "q_scd2_runs")
      assert(exchanges(sc) == 1 && sc.contains("hashpartitioning(user_id"),
        s"q_scd2_runs: three operators, one exchange:\n$sc")
      // q_retention_cohort: the event-sized shuffle happens once (the
      // (user, day) distinct); everything after runs on user×day frames.
      val rc = plan(dir, "q_retention_cohort")
      assert(exchanges(rc) <= 3 && !rc.toLowerCase.contains("expand"),
        s"q_retention_cohort: dedup-then-count, no countDistinct expand:\n$rc")
      // positional postings: the position intersections must be equi-joins
      // on doc_id. Count hash-equi join operators — phrase has the (role,
      // term) broadcast PLUS two position joins (≥3); proximity has its
      // scalar broadcast (a legitimate 1-row BroadcastNestedLoopJoin) plus
      // the doc_id join (≥1 equi). A naive positions×positions regression
      // would surface as an extra nested-loop join.
      def equiJoins(p: String): Int =
        p.linesIterator.count(l => l.contains("SortMergeJoin")
          || l.contains("ShuffledHashJoin") || l.contains("BroadcastHashJoin"))
      def nestedLoops(p: String): Int =
        p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      // (the term-attach broadcast join runs inside the matched-postings
      // checkpoint job; the final plan shows the two position joins)
      val php = plan(dir, "t_phrase_search")
      assert(equiJoins(php) >= 2 && nestedLoops(php) == 0,
        s"t_phrase_search: both position joins must be equi-joins:\n$php")
      val prp = plan(dir, "t_proximity_search")
      assert(equiJoins(prp) >= 1 && nestedLoops(prp) <= 1,
        s"t_proximity_search: doc_id equi-join + at most the scalar broadcast:\n$prp")
      // t_kmv_distinct / t_zipf_fit: the corpus-sized count stages carry a
      // partial phase (map-side combine), and the rank windows run on
      // vocabulary-bounded frames.
      Seq("t_kmv_distinct", "t_zipf_fit").foreach { q =>
        val p = plan(dir, q)
        assert(p.contains("partial_count"),
          s"$q: corpus count stage must partial-aggregate:\n$p")
      }
    }

    test(s"materialize-once discipline: scan counts pinned per plan (recompute-bug class)$tag") {
      // Round 10 caught FOUR double-compute bugs (ccnet, KMV, phrase
      // search, Kneser–Ney) only at the ×10/×100 scale loop: a frame
      // feeding k consumers lost its eager localCheckpoint and lazy Spark
      // re-ran the corpus-sized pipeline per consumer. The tell is pure
      // plan shape — the checkpointed frame appears as `Scan ExistingRDD`
      // nodes and the corpus as `FileScan parquet`; a dropped checkpoint
      // re-inlines the pipeline and the parquet scan count JUMPS. Pinning
      // the counts makes that class fail here at sf0.01, not at sf10
      // (VERDICT r10 #2). maxParquet is the measured node count at this
      // HEAD; minRdd the checkpoint-consumer count (fewer means a
      // materialization was dropped).
      val pins = Seq(
        // (entry, max FileScan parquet nodes, min Scan ExistingRDD nodes)
        ("t_ccnet_buckets", 0, 3),   // scored frame checkpointed (sf10 fix)
        ("t_kmv_distinct", 0, 2),    // dt materialized once (sf10 fix)
        ("t_kneser_ney", 1, 4),      // bigram count table (sf1 fix)
        ("t_triangle_count", 0, 3),  // edge list checkpointed for 3 legs
        ("t_phrase_search", 0, 3),   // matched postings one-pass (sf1 fix)
        ("t_proximity_search", 4, 0),// postings legs re-derive: 4 pruned scans
        ("t_prf_rm3", 4, 4),         // ONE tokenize: tf checkpointed (r13);
                                     // remaining parquet scans are the two
                                     // n_docs counts (was 14 pruned legs)
        ("e_jl_project", 2, 0),      // projection pass + census probe
        ("q15_top_supplier", 1, 2),  // supplier view collapsed once, 2 readers
        ("t_label_prop", 1, 10),     // edges pre-partitioned once (r9 fix)
        ("t_source_pagerank", 0, 1)) // rank frame of the executed fixpoint
      pins.foreach { case (q, maxParquet, minRdd) =>
        val p = plan(dir, q)
        val parquetScans = p.linesIterator.count(_.contains("FileScan parquet"))
        val rddScans = p.linesIterator.count(_.contains("Scan ExistingRDD"))
        assert(parquetScans <= maxParquet,
          s"$q: $parquetScans parquet scans (pinned <= $maxParquet) — a " +
            s"materialized-once frame is being recomputed:\n$p")
        assert(rddScans >= minRdd,
          s"$q: $rddScans ExistingRDD scans (pinned >= $minRdd) — a " +
            s"localCheckpoint was dropped:\n$p")
      }
    }

    test(s"r11 wave: scalable ntile has no global window, attribution rides one user exchange, pii scan is a pure map$tag") {
      // organic exchanges only (loader spread excluded — see above)
      def exchanges(p: String): Int =
        p.linesIterator.count(l => l.contains("Exchange ") &&
          !l.contains("ReusedExchange") &&
          !l.contains("hashpartitioning(xxhash64("))
      // q_rfm_scalable: the exact-ntile plan must carry NO ntile window
      // (the single-task shape it replaces); tiles come from the offsets
      // broadcast join. The only windows left are the per-partition
      // row_number and the #partitions-sized census cumsums.
      val rf = plan(dir, "q_rfm_scalable")
      assert(!rf.contains("ntile("),
        s"q_rfm_scalable: the global-ntile window crept back:\n$rf")
      assert(rf.contains("BroadcastHashJoin"),
        s"q_rfm_scalable: partition offsets must broadcast:\n$rf")
      // q_attribution_last_touch: struct-max window + conversion agg share
      // the work of ONE user exchange; only the |types|-bounded rollup
      // adds its exchange.
      val at = plan(dir, "q_attribution_last_touch")
      assert(at.contains("hashpartitioning(user_id") && exchanges(at) <= 2
        && !at.contains("Join"),
        s"q_attribution_last_touch: one user exchange + bounded rollup:\n$at")
      // t_pii_scan: per-row regex map over the scan — no exchange, no
      // join, no aggregate anywhere.
      val pii = plan(dir, "t_pii_scan")
      assert(exchanges(pii) == 0 && !pii.contains("Join") && !pii.contains("Aggregate"),
        s"t_pii_scan must stay a pure map:\n$pii")
    }

    test(s"grouped top-k is a partial aggregate, not a window sort$tag") {
      // TypedImperativeAggregate plans as ObjectHashAggregate with a partial
      // phase before the exchange — the O(groups·k) shuffle property; the
      // weighted sampler rides the same heap
      Seq("q_group_topk", "t_weighted_sample").foreach { q =>
        val p = plan(dir, q)
        assert(p.contains("ObjectHashAggregate"),
          s"$q should aggregate via ObjectHashAggregate:\n$p")
        assert(!p.contains("Window"), s"$q must not fall back to a window sort")
      }
    }
  }
}
