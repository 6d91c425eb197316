package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** The distributed trainer must equal an independent driver-side replay of
  * the same fixed-point arithmetic (every round, bit for bit), be invariant
  * to partitioning (full-batch GD has no order dependence), and actually
  * LEARN — separable data must train to high accuracy, not just move. */
class LogisticRegressionSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val Micro = 1000000L

  /** Driver-side replay: identical units, identical IEEE sequence. */
  private def refTrain(rows: Seq[(Long, Array[Long])], d: Int,
      rounds: Int, lrMicro: Long): Array[Long] = {
    val w = Array.fill(d + 1)(0L)
    for (_ <- 1 to rounds) {
      val g = Array.fill(d + 1)(BigInt(0))
      rows.foreach { case (y, x) =>
        var zp = w(0) * Micro
        var j = 0
        while (j < d) { zp += w(j + 1) * x(j); j += 1 }
        val z = zp.toDouble / 1e12
        val p = math.floor((0.5 + z / (2.0 + 2.0 * math.abs(z))) *
          Micro.toDouble + 0.5).toLong
        val resid = p - y * Micro
        g(0) += BigInt(resid) * Micro
        j = 0
        while (j < d) { g(j + 1) += BigInt(resid) * x(j); j += 1 }
      }
      val n = rows.size
      var j = 0
      while (j <= d) {
        w(j) = w(j) - math.floor(
          lrMicro.toDouble * g(j).toDouble / (n.toDouble * 1e12) + 0.5).toLong
        j += 1
      }
    }
    w
  }

  private def syntheticRows(n: Int, seed: Int): Seq[(Long, Array[Long])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      // separable-ish: y = 1 examples have high x0, low x1
      val y = rnd.nextInt(2).toLong
      val x0 = if (y == 1) 700000L + rnd.nextInt(300000) else rnd.nextInt(400000).toLong
      val x1 = if (y == 1) rnd.nextInt(300000).toLong else 600000L + rnd.nextInt(400000)
      val x2 = rnd.nextInt(1000000).toLong // noise feature
      (y, Array(x0, x1, x2))
    }
  }

  private def toDf(rows: Seq[(Long, Array[Long])]) =
    rows.zipWithIndex.map { case ((y, x), i) =>
      (i.toLong, y, x(0), x(1), x(2))
    }.toDF("id", "y", "x0", "x1", "x2")

  test("distributed training equals the driver-side fixed-point replay") {
    val rows = syntheticRows(300, seed = 11)
    val m = LogisticRegression.train(toDf(rows), "y", Seq("x0", "x1", "x2"),
      rounds = 6, lrMicro = 4000000L)
    val ref = refTrain(rows, d = 3, rounds = 6, lrMicro = 4000000L)
    assert(m.weightsMicro.toSeq === ref.toSeq)
  }

  test("partition-count invariant (full-batch GD has no order dependence)") {
    val rows = syntheticRows(200, seed = 23)
    val w1 = LogisticRegression.train(toDf(rows).repartition(1),
      "y", Seq("x0", "x1", "x2"), 5, 4000000L).weightsMicro.toSeq
    val w32 = LogisticRegression.train(toDf(rows).repartition(32),
      "y", Seq("x0", "x1", "x2"), 5, 4000000L).weightsMicro.toSeq
    assert(w1 === w32)
  }

  test("separable data trains to high accuracy; weights point the right way") {
    val rows = syntheticRows(500, seed = 42)
    val df = toDf(rows)
    val m = LogisticRegression.train(df, "y", Seq("x0", "x1", "x2"),
      rounds = 12, lrMicro = 4000000L)
    // discriminative directions learned: x0 up-weights, x1 down-weights
    assert(m.weightsMicro(1) > 0, "x0 must get a positive weight")
    assert(m.weightsMicro(2) < 0, "x1 must get a negative weight")
    val scored = LogisticRegression.score(df, m, Seq("x0", "x1", "x2"))
    val acc = scored.select(
      avg(when(col("keep") === (col("y") === 1L), 1.0).otherwise(0.0)))
      .as[Double].head()
    assert(acc >= 0.95, s"accuracy $acc on separable data")
    // scores are valid grid probabilities
    val (mn, mx) = scored.agg(min(col("p_micro")), max(col("p_micro")))
      .as[(Long, Long)].head()
    assert(mn >= 0L && mx <= Micro)
  }

  test("grouped training: each group's model equals training that slice alone") {
    val rows = syntheticRows(300, seed = 77)
    val groups = Seq("a", "b", "c")
    val tagged = rows.zipWithIndex.map { case ((y, x), i) =>
      (groups(i % 3), i.toLong, y, x(0), x(1), x(2))
    }
    val df = tagged.toDF("g", "id", "y", "x0", "x1", "x2").repartition(8)
    val wmap = LogisticRegression.trainGrouped(
      df, "g", "y", Seq("x0", "x1", "x2"), rounds = 5, lrMicro = 4000000L)
    assert(wmap.keySet === groups.toSet)
    groups.foreach { g =>
      val slice = tagged.filter(_._1 == g)
        .map { case (_, id, y, a, b, c) => (id, y, a, b, c) }
        .toDF("id", "y", "x0", "x1", "x2")
      val solo = LogisticRegression.train(
        slice, "y", Seq("x0", "x1", "x2"), rounds = 5, lrMicro = 4000000L)
      assert(wmap(g).toSeq === solo.weightsMicro.toSeq,
        s"group $g diverged from its solo trajectory")
    }
  }

  test("grouped scoring equals per-group solo scoring; coverage contract is loud") {
    val rows = syntheticRows(120, seed = 91)
    val tagged = rows.zipWithIndex.map { case ((y, x), i) =>
      (if (i % 2 == 0) "a" else "b", i.toLong, y, x(0), x(1), x(2))
    }
    val df = tagged.toDF("g", "id", "y", "x0", "x1", "x2")
    val feats = Seq("x0", "x1", "x2")
    val wmap = LogisticRegression.trainGrouped(df, "g", "y", feats, 4, 4000000L)
    val grouped = LogisticRegression.scoreGrouped(df, "g", wmap, feats)
      .select(col("id"), col("p_micro"), col("keep"))
      .as[(Long, Long, Boolean)].collect()
      .map { case (i, p, k) => i -> ((p, k)) }.toMap
    Seq("a", "b").foreach { g =>
      val slice = tagged.filter(_._1 == g)
        .map { case (_, id, y, a, b, c) => (id, y, a, b, c) }
        .toDF("id", "y", "x0", "x1", "x2")
      val solo = LogisticRegression.score(
          slice, LogisticRegression.Model(wmap(g)), feats)
        .select(col("id"), col("p_micro"), col("keep"))
        .as[(Long, Long, Boolean)].collect()
      solo.foreach { case (i, p, k) => assert(grouped(i) === ((p, k))) }
    }
    // a row whose group has no model fails loudly, not silently
    val extra = (Seq(("zz", 999L, 0L, 1L, 2L, 3L)) ++ tagged)
      .toDF("g", "id", "y", "x0", "x1", "x2")
    intercept[IllegalArgumentException] {
      LogisticRegression.scoreGrouped(extra, "g", wmap, feats)
    }
  }

  test("grouped contracts: empty frame and group-cardinality cap fail loudly") {
    val df = toDf(syntheticRows(10, 3)).withColumn("g", col("id").cast("string"))
    intercept[IllegalArgumentException] {
      LogisticRegression.trainGrouped(df.filter(lit(false)), "g", "y",
        Seq("x0"), 1, 1L)
    }
    intercept[IllegalArgumentException] {
      LogisticRegression.trainGrouped(df, "g", "y", Seq("x0"), 1, 1L,
        maxGroups = 5)
    }
  }

  test("loud contracts: bad rounds, empty frame, weight/feature mismatch") {
    val df = toDf(syntheticRows(5, 1))
    intercept[IllegalArgumentException] {
      LogisticRegression.train(df, "y", Seq("x0"), rounds = 0, lrMicro = 1L)
    }
    intercept[IllegalArgumentException] {
      LogisticRegression.train(df.filter(lit(false)), "y", Seq("x0"), 1, 1L)
    }
    intercept[IllegalArgumentException] {
      LogisticRegression.score(df, LogisticRegression.Model(Array(0L, 0L)),
        Seq("x0", "x1"))
    }
  }
}
