package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operator library: watermarked dedup, event-time
  * windows, and custom-state sessionization via flatMapGroupsWithState —
  * the streaming faces of the engine's batch operators.
  */
object StreamOps {

  /** Streaming keyed dedup within a watermark horizon — the strong form of
    * the reference's PubSub idAttribute best-effort dedup
    * (PubSubToBigQueryPipeline.java:41). State: one entry per key inside
    * the watermark; Spark drops state older than the horizon.
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, horizon: String,
      keys: String*): DataFrame =
    df.withWatermark(tsCol, horizon).dropDuplicates(keys)

  /** Event-time tumbling aggregation (append mode after watermark close).
    * `horizon = None` assumes an upstream operator already set the
    * watermark (a stream allows exactly one definition). */
  def tumblingCounts(df: DataFrame, tsCol: String, width: String,
      horizon: Option[String], extraKeys: String*): DataFrame = {
    val marked = horizon.fold(df)(h => df.withWatermark(tsCol, h))
    marked.groupBy(window(col(tsCol), width) +: extraKeys.map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  // ---- custom-state sessionization ----------------------------------------

  final case class SessionEvent(userId: Long, tsUs: Long, value: Double)
  final case class SessionState(startUs: Long, lastUs: Long, nEvents: Long, sumValue: Double)
  final case class SessionOut(userId: Long, startUs: Long, endUs: Long,
      nEvents: Long, sumValue: Double)

  /** Gap-based session windows with explicit state — the
    * flatMapGroupsWithState face of the batch q_sessionize query. A session
    * closes when a later event arrives more than `gapUs` after it; with
    * `idleTimeout` set, an idle key's open session also closes on
    * processing-time timeout (for true always-on streams — leave it None
    * for drain-style tests, where closure is purely data-driven).
    */
  def sessionize(events: Dataset[SessionEvent], gapUs: Long,
      idleTimeout: Option[String] = Some("30 seconds")): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var cur = state.getOption
          if (idleTimeout.isDefined && state.hasTimedOut) {
            cur.foreach(s => out += SessionOut(userId, s.startUs, s.lastUs, s.nEvents, s.sumValue))
            cur = None
            state.remove()
          }
          batch.toSeq.sortBy(e => e.tsUs).foreach { e =>
            cur match {
              case Some(s) if e.tsUs - s.lastUs <= gapUs =>
                cur = Some(s.copy(lastUs = e.tsUs, nEvents = s.nEvents + 1,
                  sumValue = s.sumValue + e.value))
              case Some(s) =>
                out += SessionOut(userId, s.startUs, s.lastUs, s.nEvents, s.sumValue)
                cur = Some(SessionState(e.tsUs, e.tsUs, 1, e.value))
              case None =>
                cur = Some(SessionState(e.tsUs, e.tsUs, 1, e.value))
            }
          }
          cur match {
            case Some(s) =>
              state.update(s)
              idleTimeout.foreach(state.setTimeoutDuration)
            case None => ()
          }
          out.iterator
      }
  }

  // ---- streaming last-touch attribution ------------------------------------

  final case class TouchEvent(userId: Long, tsUs: Long, eventId: Long, eventType: String)
  /** Latest non-conversion touch seen so far: bounded state, ONE
    * (ts, id, type) triple per user, forever. */
  final case class TouchState(tsUs: Long, eventId: Long, eventType: String)
  final case class TouchOut(userId: Long, tsUs: Long, eventId: Long, touchType: String)

  /** Streaming face of the batch `q_attribution_last_touch` query: each
    * conversion event is emitted AS IT ARRIVES, credited to the user's
    * latest preceding non-conversion touch within `lookbackUs`
    * (`"none"` otherwise). Events are ordered by (tsUs, eventId) within
    * each micro-batch — the batch query's exact window order — and state
    * is the single latest-touch triple per user, so executor state is
    * user-bounded regardless of history length.
    *
    * Same in-order contract as [[funnel]] (stated, not hidden): an
    * out-of-order touch arriving in a LATER batch than a conversion it
    * precedes in event time cannot retroactively re-credit that
    * conversion. For in-order delivery the two faces agree exactly
    * (StreamOpsSpec pins credited counts ≡ the batch oracle's). */
  def lastTouchAttribution(events: Dataset[TouchEvent], conversionType: String,
      lookbackUs: Long): Dataset[TouchOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[TouchState, TouchOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[TouchEvent], state: GroupState[TouchState]) =>
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[TouchOut]()
          batch.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
            if (e.eventType == conversionType) {
              val touch = cur match {
                case Some(t) if t.tsUs >= e.tsUs - lookbackUs => t.eventType
                case _ => "none"
              }
              out += TouchOut(userId, e.tsUs, e.eventId, touch)
            } else if (cur.forall(t => t.tsUs < e.tsUs ||
                (t.tsUs == e.tsUs && t.eventId < e.eventId))) {
              cur = Some(TouchState(e.tsUs, e.eventId, e.eventType))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  // ---- streaming funnel ----------------------------------------------------

  final case class FunnelEvent(userId: Long, tsUs: Long, eventType: String)
  /** Per-user stage-completion times; −1 = not reached. Bounded state: one
    * long per stage per user, forever. */
  final case class FunnelProgress(times: Seq[Long])
  final case class FunnelStageOut(userId: Long, stage: Int, tsUs: Long)

  /** Streaming face of the batch `q_funnel` query: per-user ordered stage
    * machine over flatMapGroupsWithState, emitting each stage's FIRST
    * completion as it happens. Stage i (i > 0) completes on the first
    * `stages(i)` event with `t(i−1) < ts ≤ t(i−1) + deadlineUs`.
    *
    * Semantics note (the streaming/batch delta, stated rather than hidden):
    * completion is greedy over ARRIVAL-ordered prefixes — events are
    * sorted within each micro-batch, but an out-of-order event arriving in
    * a LATER batch cannot retroactively complete an earlier stage window
    * that a batch recompute would have found. For in-order delivery the
    * two agree exactly (StreamOpsSpec pins stage counts ≡ q_funnel's batch
    * answer over the same events).
    */
  def funnel(events: Dataset[FunnelEvent], stages: Seq[String],
      deadlineUs: Long): Dataset[FunnelStageOut] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages,
      s"funnel stages must be distinct (indexOf resolves to the first " +
        s"occurrence, so a repeated stage could never complete): $stages")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelProgress, FunnelStageOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          val t = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(stages.length)(-1L))
          val out = scala.collection.mutable.ArrayBuffer[FunnelStageOut]()
          batch.toSeq.sortBy(e => e.tsUs).foreach { e =>
            val i = stages.indexOf(e.eventType)
            if (i >= 0 && t(i) < 0
              && (i == 0 || (t(i - 1) >= 0 && e.tsUs > t(i - 1)
                && e.tsUs <= t(i - 1) + deadlineUs))) {
              t(i) = e.tsUs
              out += FunnelStageOut(userId, i + 1, e.tsUs)
            }
          }
          state.update(FunnelProgress(t.toSeq))
          out.iterator
      }
  }
}
