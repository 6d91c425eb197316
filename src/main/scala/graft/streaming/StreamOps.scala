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
}
