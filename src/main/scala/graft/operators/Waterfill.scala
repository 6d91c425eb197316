package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture budget allocation by exact integer water-filling.
  *
  * Given one row per source with an integer availability (docs, tokens —
  * whatever the budget is denominated in) and a total budget B, allocate
  * `alloc_i = min(avail_i, T)` where T is the largest level such that
  * `sum_i min(avail_i, T) <= B`, then hand the remainder `B - sum_i
  * min(avail_i, T)` out one unit each to the capped sources (those with
  * `avail_i > T`) in source-name order. The result is the max-min-fair
  * allocation: no source can gain except by taking from a source that
  * already holds no more than it does. This is the budget-design step that
  * precedes `t_mix_sample`/`t_mix_temperature`: those consume given
  * per-source quotas; this derives the quotas from a corpus census and a
  * token budget.
  *
  * Exactness: everything is BIGINT arithmetic. The level search is the
  * closed form over sources sorted by (avail, source): at ascending
  * position i with `cum_prev = sum of the i-1 smaller avails` and
  * `m = n - i + 1` remaining sources, the candidate level is
  * `(B - cum_prev) div m`; the cutoff is the FIRST position whose candidate
  * falls below its own avail (everything before it is allocated in full).
  * Division rounding never diverges cross-engine: wherever the predicate
  * `t_i < avail_i` is consulted the numerator is provably non-negative up
  * to and including the cutoff row (truncating DIV == floor there), and
  * past the cutoff both roundings agree the candidate is <= 0 < avail.
  *
  * Scale: the input is a per-SOURCE census — metadata-sized (domains, not
  * documents; the corpus-sized groupBy that produces it is the caller's
  * one shuffle). The unpartitioned sort windows here run on that census
  * frame; at 10^7 sources that is a single-task sort of 10^7 longs
  * (~100 MB, seconds) — acceptable for a planning step that runs once per
  * mixture design. The 1-row budget/cutoff frames join in as broadcasts.
  */
object Waterfill {

  /** @param census one row per source: (`keyCol` string, `availCol` long)
    * @param budget total units to hand out, as an AGGREGATE expression over
    *               the census (its `availCol` is visible as `avail`) — e.g.
    *               `expr("sum(avail) DIV 2")` for half the corpus, or
    *               `lit(100000L)` for a fixed budget. Allocations sum to
    *               `min(budget, sum(avail))`.
    * @return (`keyCol`, avail, alloc) */
  def allocate(census: DataFrame, keyCol: String, availCol: String,
      budget: Column): DataFrame = {
    val key = col(keyCol)
    val avail = col(availCol).cast("long").as("avail")
    val base = census.select(key.as("__k"), avail)

    val n1 = base.agg(count(lit(1)).as("n"), budget.cast("long").as("budget"))
    val byAvail = Window.orderBy(col("avail"), col("__k"))
    val rows = base.join(broadcast(n1), lit(true), "left")
      .withColumn("i", row_number().over(byAvail).cast("long"))
      .withColumn("cum_prev", coalesce(
        sum(col("avail")).over(byAvail.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("m", col("n") - col("i") + 1L)
      .withColumn("ti", expr("(budget - cum_prev) DIV m"))

    // First position whose equal-share candidate can't cover its own avail.
    // Empty when budget >= sum(avail) — then everyone is allocated in full.
    val cut = rows.filter(col("ti") < col("avail"))
      .orderBy(col("i")).limit(1)
      .select(col("i").as("k"), col("ti").as("tstar"),
        (col("budget") - col("cum_prev") - col("ti") * col("m")).as("rem"))

    val bySource = Window.partitionBy(col("capped")).orderBy(col("__k"))
    rows.join(broadcast(cut), lit(true), "left")
      .withColumn("capped", col("k").isNotNull && col("i") >= col("k"))
      .withColumn("rnk", row_number().over(bySource).cast("long"))
      .withColumn("alloc",
        when(!col("capped"), col("avail"))
          .otherwise(col("tstar") + when(col("rnk") <= col("rem"), 1L).otherwise(0L)))
      .select(col("__k").as(keyCol), col("avail"), col("alloc"))
  }
}
