package graft.hedera

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/** Fixed-rate orchestration of the dedupe jobs — the Spring `@Scheduled`
  * analog (IncrementalDeduplication.java:66 every 5 min,
  * FullDeduplication.java:62 every 24 h; defaults docs/configurations.md:
  * 14-17). Runs queue behind one worker if an invocation overruns its rate,
  * exactly like a single-threaded Spring scheduler; failures increment the
  * failure counter and the next tick retries from saved state
  * (AbstractDeduplication.java:119-125).
  */
final class DedupeScheduler(
    job: Deduplication.Job,
    incrementalRateMs: Long = 300000L,
    fullRateMs: Long = 86400000L) {

  private val exec: ScheduledExecutorService = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-dedupe-scheduler"); t.setDaemon(true); t
  })

  // Run counters (invocations, runtime, timestamps, failures, duplicate
  // counts, delay) are recorded by the Job itself — the scheduler only
  // contains the failure so the next tick retries from saved state.
  private def guarded(kind: String)(body: => Deduplication.Result): Unit =
    try { body; () }
    catch {
      case e: Throwable =>
        System.err.println(s"[dedupe-$kind] failed: ${e.getMessage}")
    }

  def start(): Unit = {
    exec.scheduleAtFixedRate(() => guarded("incremental")(job.runIncremental()),
      incrementalRateMs, incrementalRateMs, TimeUnit.MILLISECONDS)
    exec.scheduleAtFixedRate(() => guarded("full")(job.runFull()),
      fullRateMs, fullRateMs, TimeUnit.MILLISECONDS)
  }

  /** One immediate pair of runs (tests / cron-style invocation). */
  def runOnceNow(): (Deduplication.Result, Deduplication.Result) =
    (job.runIncremental(), job.runFull())

  def stop(): Unit = exec.shutdownNow()
}
