package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the test tables: replicates the fact tables
  * `factor`× with shifted keys (join semantics preserved) and copies the
  * dimensions, producing a larger corpus for scale evidence (e.g. sf0.1 ×10
  * ≈ sf1). Usage:
  *
  *   graft.GenScale <inDir> <outDir> <factor> [tables]
  *
  * `tables` (optional, comma-separated) restricts generation to a subset —
  * e.g. `events,documents` for the sf10 pipeline spot-run, where scaling
  * lineitem/orders 100× would only burn disk the measurement never reads.
  *
  * Replication is one distributed pass per table — a broadcast cross join
  * against a `range(factor)` of replica indices (never a driver loop, never
  * N re-reads of the input):
  *
  *  - orders/lineitem: o_orderkey/l_orderkey shifted by replica·stride so
  *    the order join stays 1:N and order keys stay unique; customer keys
  *    are left alone (each replica's orders belong to the same customers —
  *    dims grow sublinearly in a warehouse).
  *  - events: event_id and user_id shifted — replica users, so per-user
  *    session/window workloads scale in group count, not group size.
  *  - documents: doc_id shifted; replicas get a tiny `r<i> ` prefix so they
  *    are near-duplicates (a realistic curation corpus: heavy near-dup
  *    clusters) rather than exact clones.
  *  - embeddings: vec_id shifted, vectors copied (exact-dup clusters —
  *    the dedup-by-embedding worst case, which is what we want to stress).
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: GenScale <inDir> <outDir> <factor> [tables]")
    val Array(inDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1, "factor must be >= 1")
    val want: String => Boolean =
      if (args.length == 4) args(3).split(",").map(_.trim).toSet else _ => true
    val spark = GraftSession.localFromEnv("graft-genscale")

    def in(name: String): DataFrame = Tables.load(spark, inDir, name)
    // Fact tables land as many files: the sf0.1 inputs are single-file, and
    // a crossJoin against a broadcast range inherits that one partition — a
    // single ~50 MB parquet file reads as ONE scan task, which makes every
    // downstream measurement a single-core number. A warehouse table of
    // this size is dozens-to-thousands of files; 32 matches local[32] and
    // splits files well under maxPartitionBytes so scans parallelize.
    def write(name: String, df: DataFrame, files: Int = 32): Unit = {
      df.repartition(files)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
      println(s"wrote $name")
    }

    // dimension tables: straight copies (small — one file each)
    Seq("region", "nation", "customer", "supplier", "part")
      .filter(want).foreach { n => write(n, in(n), files = 1) }

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val reps = () => broadcast(spark.range(factor).select(col("id").as("__rep")))

    if (want("orders") || want("lineitem")) {
      val orders = in("orders")
      val orderStride = stride(orders, "o_orderkey")
      if (want("orders"))
        write("orders", orders.crossJoin(reps())
          .withColumn("o_orderkey", col("o_orderkey") + col("__rep") * orderStride)
          .drop("__rep"))
      if (want("lineitem"))
        write("lineitem", in("lineitem").crossJoin(reps())
          .withColumn("l_orderkey", col("l_orderkey") + col("__rep") * orderStride)
          .drop("__rep"))
    }

    if (want("events")) {
      val events = in("events")
      val eventStride = stride(events, "event_id")
      val userStride = stride(events, "user_id")
      // ts (ns epoch long) must ALSO shift: it is the ingest dedupe key, and
      // unshifted replicas would make the scaled corpus 90% duplicates.
      // Replicas spread over at most 10 span-groups: a 100× corpus then has
      // 10× the time range at 10× the daily density — how a warehouse
      // actually grows (traffic outpaces the calendar; a pure span stretch
      // would leave per-day row counts CONSTANT and splinter the table into
      // factor× near-empty day partitions). The `__rep div groups` ns nudge
      // keeps keys unique within a group: original points are ≫ factor ns
      // apart with overwhelming probability, and the rare collision is just
      // one more genuine duplicate for the dedupe job.
      val Array(tsLo, tsHi) = events.agg(min(col("ts")), max(col("ts")))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      val tsSpan = tsHi - tsLo + 1L
      val groups = math.min(factor, 10)
      write("events", events.crossJoin(reps())
        .withColumn("event_id", col("event_id") + col("__rep") * eventStride)
        .withColumn("user_id", col("user_id") + col("__rep") * userStride)
        .withColumn("ts",
          col("ts") + (col("__rep") % groups) * tsSpan + expr(s"__rep div $groups"))
        .drop("__rep"))
    }

    if (want("documents")) {
      val docs = in("documents")
      val docStride = stride(docs, "doc_id")
      write("documents", docs.crossJoin(reps())
        .withColumn("doc_id", col("doc_id") + col("__rep") * docStride)
        .withColumn("text",
          when(col("__rep") === 0, col("text"))
            .otherwise(concat(lit("r"), col("__rep"), lit(" "), col("text"))))
        .drop("__rep"))
    }

    if (want("embeddings")) {
      val emb = in("embeddings")
      val vecStride = stride(emb, "vec_id")
      // Replicas are PERTURBED, not copied (VERDICT r10 #4): an exact copy
      // makes every scaled-recall reading self-confirming — each probe's
      // true neighbors are its own replicas sitting in the same IVF cell,
      // so recall@k reads 1.000 no matter how bad the quantizer is. The
      // jitter is deterministic (xxhash64 of (vec_id, replica, dim) →
      // uniform in [-ε, ε] per component) and re-normalized. ε itself
      // varies PER REPLICA (xxhash64(vec_id, replica) → uniform in
      // [0.02, 0.42]): a single tight shell would just recreate the
      // degeneracy one level up — every probe's true top-k stays inside
      // its own replica family in one cell, and recall reads 1.0 again
      // (measured). Mixed shells keep ~1/5 of replicas genuine
      // near-duplicates (ε ≤ 0.1 → cos ≳ 0.95: the dedup-stress story)
      // while the loose shells (cos → ~0.5) acquire REAL neighbor
      // orderings that cross cell boundaries — the geometry a quantizer
      // can get wrong. Replica 0 stays byte-identical so the original
      // corpus is a subset.
      val jittered = expr(
        """transform(embedding, (x, i) ->
          |  CAST(x AS DOUBLE) +
          |  (0.02 + 0.40 * (0.5 + CAST(xxhash64(vec_id, __rep) AS DOUBLE)
          |                        / 1.8446744073709552e19)) *
          |  (CAST(xxhash64(vec_id, __rep, i) AS DOUBLE) / 9.223372036854776e18))
          |""".stripMargin.replace("\n", " "))
      val renormed = expr(
        "transform(__j, x -> CAST(x / sqrt(aggregate(__j, 0D, (a, v) -> a + v * v)) AS FLOAT))")
      write("embeddings", emb.crossJoin(reps())
        .withColumn("vec_id", col("vec_id") + col("__rep") * vecStride)
        .withColumn("__j", when(col("__rep") === 0, col("embedding").cast("array<double>"))
          .otherwise(jittered))
        .withColumn("embedding",
          when(col("__rep") === 0, col("embedding")).otherwise(renormed))
        .drop("__rep", "__j"))
    }

    spark.stop()
  }
}
