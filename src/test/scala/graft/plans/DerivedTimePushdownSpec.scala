package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

/** DerivedTimeFilterPushdown: the added raw-column conjuncts must be
  * IMPLIED by the derived predicate — any divergence silently drops or
  * leaks rows at the scan. The oracle here is driver-side Scala integer
  * math over collected rows (quot = Java truncation, same as Spark's
  * IntegralDivide), computed without any Spark filter, so the rule cannot
  * touch it. Negative values exercise the truncation-vs-floor corner the
  * inversion has to get right.
  */
class DerivedTimePushdownSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  // (event_id, ts-ns-long) collected once; expected sets via driver math.
  private lazy val rows: Seq[(Long, Long)] =
    Tables.load(spark, GraftTestSpark.sfDir, "events")
      .select(col("event_id"), col("ts")).as[(Long, Long)].collect().toSeq

  // window literals inside the corpus's January-2024 span (µs and sec)
  private val LoUs = 1704844800000000L
  private val HiUs = 1705449600000000L
  private val MidSec = 1705276800L

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").as[Long].collect().toSet

  private def evDf = Tables.load(spark, GraftTestSpark.sfDir, "events")

  test("µs window (div 1000 between) matches driver-side quot math") {
    val got = ids(evDf.filter(expr("ts div 1000").between(LoUs, HiUs)))
    val want = rows.collect { case (id, ts)
      if ts / 1000 >= LoUs && ts / 1000 <= HiUs => id }.toSet
    assert(got == want && want.nonEmpty)
  }

  test("every comparison op inverts exactly (µs and seconds chains)") {
    val cases: Seq[(String, Long => Boolean)] = Seq(
      (s"ts div 1000 > $LoUs", ts => ts / 1000 > LoUs),
      (s"ts div 1000 >= $LoUs", ts => ts / 1000 >= LoUs),
      (s"ts div 1000 < $HiUs", ts => ts / 1000 < HiUs),
      (s"ts div 1000 <= $HiUs", ts => ts / 1000 <= HiUs),
      (s"ts div 1000000000 = $MidSec", ts => ts / 1000000000L == MidSec),
      // literal-on-the-left mirrors
      (s"$LoUs <= ts div 1000", ts => LoUs <= ts / 1000),
      (s"$HiUs > ts div 1000", ts => HiUs > ts / 1000))
    for ((sql, pred) <- cases) {
      val got = ids(evDf.filter(expr(sql)))
      val want = rows.collect { case (id, ts) if pred(ts) => id }.toSet
      assert(got == want, s"mismatch for: $sql")
      assert(want.nonEmpty || sql.contains("="), s"degenerate case: $sql")
    }
  }

  test("negative long values: truncation (not floor) inversion is exact") {
    // quot(-9, 10) = 0, quot(-10, 10) = -1 — floor-based inversion would
    // disagree exactly here
    val data = (-25L to 25L).map(v => (v, v))
    val df = data.toDF("event_id", "v")
    for (b <- Seq(-3L, -2L, -1L, 0L, 1L, 2L)) {
      val cases: Seq[(String, Long => Boolean)] = Seq(
        (s"v div 10 >= $b", v => v / 10 >= b),
        (s"v div 10 > $b", v => v / 10 > b),
        (s"v div 10 <= $b", v => v / 10 <= b),
        (s"v div 10 < $b", v => v / 10 < b),
        (s"v div 10 = $b", v => v / 10 == b))
      for ((sql, pred) <- cases) {
        val got = ids(df.filter(expr(sql)))
        val want = data.collect { case (id, v) if pred(v) => id }.toSet
        assert(got == want, s"mismatch for: $sql (b=$b)")
      }
    }
  }

  test("negative timestamps through the unix_micros chain") {
    val df = Seq(-2500000L, -1500000L, -1L, 0L, 1L, 1500000L)
      .toDF("us").select(col("us").as("event_id"),
        timestamp_micros(col("us")).as("t"))
    // seconds image of a timestamp: unix_micros(t) div 1000000
    val got = ids(df.filter(expr("unix_micros(t) div 1000000 >= -1")))
    val want = Seq(-2500000L, -1500000L, -1L, 0L, 1L, 1500000L)
      .filter(us => us / 1000000L >= -1L).toSet
    assert(got == want)
  }

  test("unsatisfiable and out-of-range literals degrade, never corrupt") {
    // µs value can never reach Long.MaxValue/1000 · 1000 — empty, no error
    assert(ids(evDf.filter(expr(s"ts div 1000 >= ${Long.MaxValue}"))).isEmpty)
    // bound inversion past the Long range must drop the bound, not wrap
    val all = ids(evDf.filter(expr(s"ts div 1000 >= ${Long.MinValue}")))
    assert(all == rows.map(_._1).toSet)
    // equality on a non-multiple with a multiply chain: empty by algebra
    assert(ids(evDf.filter(expr("ts = 1704844800000000500"))).isEmpty)
  }

  test("the raw-column window predicate reaches the parquet scan") {
    val plan = evDf.filter(expr("ts div 1000").between(LoUs, HiUs))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts,") && plan.contains("LessThanOrEqual(ts,"),
      s"window bounds not pushed:\n$plan")
  }

  test("rule is convergent: a second manual application is a no-op") {
    val optimized = evDf.filter(expr("ts div 1000").between(LoUs, HiUs))
      .queryExecution.optimizedPlan
    val again = DerivedTimeFilterPushdown(optimized)
    assert(again.fastEquals(optimized), "rule re-fired on an already-rewritten plan")
  }
}
