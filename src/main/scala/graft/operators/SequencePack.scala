package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Greedy sequence packing — the exact curated-corpus → training-batch
  * assignment (complementing the offset-chunked `t_pack_sequences` form,
  * where a doc may straddle a boundary): within each shard, docs are
  * visited in order and appended to the current pack until adding one
  * would exceed the token budget, which opens a new pack; an oversized doc
  * occupies a pack alone.
  *
  * Scale shape: ONE pinned-count shuffle on the shard key + an in-partition
  * sort, then a single sequential pass per shard (`mapPartitions` — the
  * recurrence `fill' = if (fill + n > budget) n else fill + n` has a
  * genuine loop-carried dependency, so per-shard sequential IS the
  * algorithm; shards are the parallelism unit, exactly how production
  * packers scale). The pass tracks shard changes itself, so correctness
  * does not depend on one-shard-per-partition placement.
  */
object SequencePack {

  /** Returns (shard: string, ord: long, n_tokens: long, pack_id: long);
    * `pack_id` restarts at 0 per shard. */
  def greedyPack(docs: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        F.col(shardCol).cast("string").as("shard"),
        F.col(orderCol).cast("long").as("ord"),
        F.col(tokensCol).cast("long").as("n_tokens"))
      .repartition(spark.sparkContext.defaultParallelism, F.col("shard"))
      .sortWithinPartitions(F.col("shard"), F.col("ord"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // `started` (not a null sentinel) detects the first row: a genuine
        // null shard key would compare equal to the null-initialized var and
        // skip the shard-reset branch, mis-numbering the shard's first pack.
        var started = false
        var shard: String = null
        var fill = 0L
        var pack = 0L
        it.map { case (s, o, n) =>
          if (!started || s != shard) { started = true; shard = s; pack = 0L; fill = n }
          else if (fill + n > budgetTokens) { pack += 1; fill = n }
          else fill += n
          (s, o, n, pack)
        }
      }
      .toDF("shard", "ord", "n_tokens", "pack_id")
  }
}
