package graft.hedera

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import graft.metrics.Metrics

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
    fullRateMs: Long = 86400000L,
    registry: graft.metrics.MetricsRegistry = Metrics.global) {

  private val exec: ScheduledExecutorService = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-dedupe-scheduler"); t.setDaemon(true); t
  })

  private def guarded(kind: String)(body: => Deduplication.Result): Unit =
    try {
      registry.inc(Metrics.DedupeInvocations)
      val t0 = System.nanoTime()
      val res = body
      registry.set(Metrics.DedupeRuntime, (System.nanoTime() - t0) / 1000000)
      registry.set(Metrics.DedupeEndTimestamp, res.windowEndUs)
      registry.inc(Metrics.DuplicatesCount, res.duplicatesRemoved)
    } catch {
      case e: Throwable =>
        registry.inc(Metrics.DedupeFailures)
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
