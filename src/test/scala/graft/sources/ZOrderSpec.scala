package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The z-order key must equal an independent bit-interleave reference, and
  * the clustered WRITE must deliver the thing it exists for: parquet
  * row-group min/max pruning on EVERY clustered column — measured from the
  * real footers, not asserted from theory. A linear sort is the control:
  * perfect on its leading column, none on the other. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  // --- independent reference ---

  private def refBucket(v: Long, mn: Long, mx: Long, bits: Int): Long =
    if (mx == mn) 0L
    else math.min(
      math.floor((v.toDouble - mn.toDouble) * (1L << bits).toDouble /
        (mx.toDouble - mn.toDouble)).toLong,
      (1L << bits) - 1L)

  private def refInterleave(bs: Seq[Long], bits: Int): Long = {
    var z = 0L
    val d = bs.size
    for (j <- 0 until bits; i <- 0 until d)
      z |= ((bs(i) >> j) & 1L) << (j * d + i)
    z
  }

  test("zkey equals the reference interleave over lineitem") {
    val li = graft.Tables.load(spark, GraftTestSpark.sfDir, "lineitem")
    val got = ZOrderLayout
      .withZKey(li, Seq("l_partkey", "l_suppkey"), bits = 16)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        col("l_partkey").cast("long"), col("l_suppkey").cast("long"), col("zkey"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val pk = got.map(_._3); val sk = got.map(_._4)
    val (mnp, mxp, mns, mxs) = (pk.min, pk.max, sk.min, sk.max)
    got.foreach { case (_, _, p, s, z) =>
      val expect = refInterleave(
        Seq(refBucket(p, mnp, mxp, 16), refBucket(s, mns, mxs, 16)), 16)
      assert(z === expect)
    }
  }

  test("three-plus-column keys and the 62-bit cap") {
    val df = Seq((1L, 2L, 3L), (7L, 5L, 0L), (3L, 3L, 3L))
      .toDF("a", "b", "c")
    val got = ZOrderLayout.withZKey(df, Seq("a", "b", "c"), bits = 3)
      .select(col("a"), col("b"), col("c"), col("zkey"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, z) =>
      val expect = refInterleave(Seq(
        refBucket(a, 1, 7, 3), refBucket(b, 2, 5, 3), refBucket(c, 0, 3, 3)), 3)
      assert(z === expect)
    }
    intercept[IllegalArgumentException] {
      ZOrderLayout.interleave(Seq(col("a"), col("b"), col("c"), col("a")), 16)
    }
  }

  test("fractional columns with range << 1 spread across buckets") {
    // normalized scores in [0, 1e-3]: the old (mx-mn+1) denominator
    // collapsed these all into bucket 0, silently dropping the column
    // from the key
    val df = (0 until 64).map(i => (i.toLong, i.toDouble * 1e-3 / 63.0))
      .toDF("id", "score")
    val keyed = ZOrderLayout.withZKey(df, Seq("score"), bits = 4)
    val distinctBuckets = keyed.select(col("zkey")).distinct().count()
    assert(distinctBuckets === 16L) // all 2^4 buckets hit
    // max value lands in the top bucket, clamped — never 2^bits
    val mx = keyed.agg(max(col("zkey"))).as[Long].head()
    assert(mx === 15L)
    // constant column: every row buckets to 0, no NaN/divide-by-zero
    val const = ZOrderLayout.withZKey(
      Seq((1L, 5.0), (2L, 5.0)).toDF("id", "v"), Seq("v"), bits = 4)
    assert(const.select(col("zkey")).distinct().as[Long].collect().toSeq === Seq(0L))
  }

  // --- the actual point: multi-column row-group pruning ---

  /** Fraction of row groups a [lo, hi] predicate on `column` must read —
    * one footer sweep (with a density floor so the measurement is
    * meaningful); equals [[ZOrderLayout.pruneFraction]] by construction. */
  private def overlapFraction(dir: String, column: String,
      lo: Long, hi: Long): Double = {
    val rs = ZOrderLayout.rowGroupRanges(spark, dir, column)
    assert(rs.size >= 8, "need enough row groups to measure")
    rs.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / rs.size
  }

  test("z-order prunes row groups on BOTH columns; linear sort only on its leading one") {
    // uniform 256x256 grid, shuffled ids — the worst case for accidental
    // locality. Small row groups so the footer sample is dense.
    val n = 120000
    val df = spark.range(n.toLong).select(
      (pmod(hash(col("id")), lit(256))).cast("long").as("x"),
      (pmod(hash(col("id") + 1000000), lit(256))).cast("long").as("y"))

    val zDir = GraftTestSpark.tmpDir("zorder-z")
    val lDir = GraftTestSpark.tmpDir("zorder-linear")
    val blockOpt = Map("parquet.block.size" -> "32768")

    ZOrderLayout.withZKey(df, Seq("x", "y"), bits = 8)
      .repartitionByRange(4, col("zkey")).sortWithinPartitions("zkey")
      .drop("zkey")
      .write.options(blockOpt).mode("overwrite").parquet(zDir)
    df.repartitionByRange(4, col("x")).sortWithinPartitions("x", "y")
      .write.options(blockOpt).mode("overwrite").parquet(lDir)

    // 1/8-of-domain predicate on each dimension
    val zx = overlapFraction(zDir, "x", 0, 31)
    val zy = overlapFraction(zDir, "y", 0, 31)
    val lx = overlapFraction(lDir, "x", 0, 31)
    val ly = overlapFraction(lDir, "y", 0, 31)

    // linear control behaves as expected: near-perfect on x, useless on y
    assert(lx <= 0.3, s"linear leading-column pruning broke: $lx")
    assert(ly >= 0.9, s"linear layout unexpectedly pruned its non-sort column: $ly")
    // z-order prunes BOTH dimensions
    assert(zx <= 0.6, s"z-order failed to prune on x: $zx")
    assert(zy <= 0.6, s"z-order failed to prune on y: $zy")
    assert(zy < ly / 1.5, s"z-order no better than linear on y: $zy vs $ly")
  }

  test("write() round-trips the rows unchanged") {
    val li = graft.Tables.load(spark, GraftTestSpark.sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"))
    val dir = GraftTestSpark.tmpDir("zorder-rt")
    ZOrderLayout.write(li, Seq("l_partkey", "l_suppkey"), dir, numFiles = 3)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted === li.columns.sorted)
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }
}
