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

  final class Job(spark: SparkSession, table: TransactionsTable, state: StateStore,
      cfg: Config = Config()) {

    private def tsUs = unix_micros(col("consensusTimestampTruncated"))

    /** Day-range image of a µs window, as a predicate on the partition
      * column. Filtering on `day` DIRECTLY (never through a function of it)
      * is what engages directory-level partition pruning — the design rule
      * the reference follows with its partition column (SURVEY.md §4) — so
      * window jobs list only the window's `day=` directories no matter how
      * large the table is. The µs filter then bounds rows exactly.
      */
    private def dayWindow(startUs: Long, endUs: Long) = {
      val loDay = java.time.LocalDate.ofEpochDay(Math.floorDiv(startUs, 86400000000L))
      val hiDay = java.time.LocalDate.ofEpochDay(Math.floorDiv(endUs, 86400000000L))
      col("day").between(lit(java.sql.Date.valueOf(loDay)), lit(java.sql.Date.valueOf(hiDay)))
    }

    /** Window scan: partition-pruned by day, row-bounded by µs. */
    def windowScan(startUs: Long, endUs: Long) =
      table.read().filter(dayWindow(startUs, endUs) && tsUs.between(startUs, endUs))

    /** A1: duplicate key groups inside [startUs, endUs]. */
    def detect(startUs: Long, endUs: Long) =
      RelationalOps.duplicateGroups(windowScan(startUs, endUs), Seq("consensusTimestamp"))

    /** A2+J2: keep one row per consensusTimestamp inside the window and
      * replace the window's days with the deduped content. */
    def repair(startUs: Long, endUs: Long): Long = {
      val winRows = windowScan(startUs, endUs)
      val before = winRows.count()
      // Whole affected days must rewrite together (a day can straddle the
      // window edge): dedupe inside the window, passthrough outside it.
      // The affected scan is itself day-pruned to the window's day range.
      val affected = table.read().filter(dayWindow(startUs, endUs)).cache()
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
