package graft.hedera

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

/** The deduplication jobs: incremental (frequent, windowed) and full
  * (infrequent, whole-history) — the Spark re-expression of the reference's
  * AbstractDeduplication state machine (hedera-deduplication-bigquery/.../
  * AbstractDeduplication.java:94-126):
  *
  *   get state → compute window → detect (A1) → repair (A2+J2) → save state.
  *
  * Windows are µs epoch values over `consensusTimestampTruncated`; state
  * lives in the KV StateStore under the reference's key names
  * (AbstractDeduplication.java:60-61). The reference's streaming-buffer
  * UPDATE-probe (IncrementalDeduplication.java:89-107) has no Spark analog —
  * its *role* (never dedupe in-flight data) maps to capping the window at
  * the max ingested timestamp; the steady-state/catch-up two-interval
  * escalation is kept (DedupeProperties.java:48-49 defaults).
  *
  * Scale shape: detection is one partial-aggregated group-count over only
  * the window's `day=` partitions (pruned at scan); repair rewrites only
  * affected days via dynamic partition overwrite. Both are O(window), never
  * O(table).
  */
object Deduplication {

  val IncrementalStateKey = "incrementalLatestEndTimestamp"
  val FullStateKey = "fullLatestEndTimestamp"

  final case class Config(
      steadyStateIntervalUs: Long = 600L * 1000000,   // 10 min (DedupeProperties.java:49)
      catchupIntervalUs: Long = 21600L * 1000000)     // 6 h  (DedupeProperties.java:48)

  final case class Result(
      windowStartUs: Long, windowEndUs: Long,
      duplicateGroups: Long, duplicatesRemoved: Long)

  private def usCol = (unix_micros(col("consensusTimestampTruncated"))).as("ts_us")

  final class Job(spark: SparkSession, table: TransactionsTable, state: StateStore,
      cfg: Config = Config()) {

    private def tsUs = unix_micros(col("consensusTimestampTruncated"))

    /** A1: duplicate key groups inside [startUs, endUs]. */
    def detect(startUs: Long, endUs: Long) =
      RelationalOps.duplicateGroups(
        table.read().filter(tsUs.between(startUs, endUs)),
        Seq("consensusTimestamp"))

    /** A2+J2: keep one row per consensusTimestamp inside the window and
      * replace the window's days with the deduped content. */
    def repair(startUs: Long, endUs: Long): Long = {
      val winDays = table.read().filter(tsUs.between(startUs, endUs))
      val before = winDays.count()
      // Whole affected days must rewrite together (a day can straddle the
      // window edge): dedupe inside the window, passthrough outside it.
      val days = winDays.select(col("day")).distinct()
      val affected = table.read().join(days, Seq("day"), "left_semi").cache()
      try {
        val inWin = affected.filter(tsUs.between(startUs, endUs))
        val outWin = affected.filter(!tsUs.between(startUs, endUs))
        val deduped = inWin.dropDuplicates("consensusTimestamp")
        val after = deduped.count()
        table.overwriteDays(outWin.unionByName(deduped))
        before - after
      } finally affected.unpersist()
    }

    /** Window-end selection with steady-state → catch-up escalation, capped
      * at the latest ingested row (the in-flight-data guard). */
    def probeEnd(startUs: Long): Long = {
      val maxTs = table.read().agg(max(tsUs)).first() match {
        case r if r.isNullAt(0) => return startUs
        case r => r.getLong(0)
      }
      val base = table.read().filter(tsUs > startUs).agg(min(tsUs)).first() match {
        case r if r.isNullAt(0) => return startUs
        case r => r.getLong(0)
      }
      val steady = base + cfg.steadyStateIntervalUs
      if (steady >= maxTs) maxTs
      else {
        val catchup = base + cfg.catchupIntervalUs
        math.min(catchup, maxTs)
      }
    }

    /** One incremental run (IncrementalDeduplication.java:66-107). */
    def runIncremental(): Result = {
      val start = state.get(IncrementalStateKey).map(_.toLong).getOrElse(0L)
      val end = probeEnd(start)
      if (end == start) return Result(start, end, 0, 0)
      val dups = detect(start, end).count()
      val removed = if (dups > 0) repair(start, end) else 0L
      state.set(IncrementalStateKey, end.toString)
      Result(start, end, dups, removed)
    }

    /** One full run over everything the incremental job has checkpointed
      * (FullDeduplication.java:62-80). */
    def runFull(): Result = {
      val end = state.get(IncrementalStateKey).map(_.toLong).getOrElse(0L)
      if (end == 0L) return Result(0, 0, 0, 0)
      val dups = detect(0L, end).count()
      val removed = if (dups > 0) repair(0L, end) else 0L
      state.set(FullStateKey, end.toString)
      Result(0, end, dups, removed)
    }
  }
}
