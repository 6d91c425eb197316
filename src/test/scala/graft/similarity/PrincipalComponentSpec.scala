package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** PrincipalComponent's contract: the integer power iteration recovers the
  * dominant direction a double-precision eigensolve finds (up to sign and
  * the integer grid), bit-identically under any partitioning, and
  * degenerates safely on a zero-covariance cloud. */
class PrincipalComponentSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private val dim = 8
  // anisotropic integer cloud: variance ~400 along `axis`, ~9 elsewhere
  private val axis: Array[Double] = {
    val raw = Array(0.9, -0.3, 0.1, 0.2, -0.1, 0.05, 0.4, -0.2)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }
  private val cloud: Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(42)
    (1 to 300).map { _ =>
      val t = rnd.nextGaussian() * 20.0
      (0 until dim).map(k =>
        math.round(t * axis(k) + rnd.nextGaussian() * 3.0)).toSeq
    }
  }

  /** Double-precision reference: covariance + 200 power steps. */
  private def referencePc(data: Seq[Seq[Long]]): Array[Double] = {
    val n = data.size.toDouble
    val mean = (0 until dim).map(k => data.map(_(k)).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      data.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n)
    var v = Array.fill(dim)(1.0)
    (1 to 200).foreach { _ =>
      val u = (0 until dim).map(i => (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val norm = math.sqrt(u.map(x => x * x).sum)
      v = u.map(_ / norm).toArray
    }
    v
  }

  private def cosAbs(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    math.abs(dot) / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  private def run(data: Seq[Seq[Long]], parts: Int = 4): Array[Double] = {
    val out = PrincipalComponent.topComponent(
        data.toDF("qv").repartition(parts), "qv")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    out.map(_._2.toDouble)
  }

  test("recovers the dominant direction of an anisotropic cloud") {
    assert(cosAbs(run(cloud), referencePc(cloud)) > 0.98)
  }

  test("partitioning never changes a component bit") {
    assert(run(cloud, 4).toSeq === run(cloud, 13).toSeq)
  }

  test("zero-covariance cloud settles to the zero vector without dividing") {
    val flat = Seq.fill(20)((1L to dim).toSeq)
    assert(run(flat).forall(_ === 0.0))
  }

  test("driver-side and distributed iteration paths are byte-identical") {
    // r12: d²-bounded corpora collect the covariance cells and iterate on
    // the driver; past maxDriverCells the Spark-job loop runs. Same
    // integer ops — forcing the distributed path must not move a bit.
    val df = cloud.toDF("qv").repartition(4)
    val fast = PrincipalComponent.topComponent(df, "qv")
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    val dist = PrincipalComponent.topComponent(df, "qv", maxDriverCells = 0L)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(fast === dist)
  }
}
