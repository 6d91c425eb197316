package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.RelationalOps._

/** Dev A/B for VERDICT r12 #5: q3/q5 star-join order — fact-first (r12,
  * the shipped form) vs dim-first (r11). Runs the two variants INTERLEAVED
  * (A B A B …, noop sink, one warmup each) so a host episode hits both
  * sides equally, and prints per-variant run lists + medians. The r11
  * bodies are copied verbatim from commit 046dc0a so the comparison is
  * against exactly what round 11 shipped.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StarJoinAB [reps]"
  */
object StarJoinAB {

  private def decP(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
  private def decR(c: org.apache.spark.sql.Column) = c.cast(DecimalType(5, 3))
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def q3FactFirst(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz"))
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp_ntz"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(decToDouble(sum(decP(col("l_extendedprice")) * decR(lit(1) - col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private def q3DimFirst(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz"))
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp_ntz"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(decToDouble(sum(decP(col("l_extendedprice")) * decR(lit(1) - col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private def q5FactFirst(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(decToDouble(sum(decP(col("l_extendedprice")) * decR(lit(1) - col("l_discount"))))
        .as("revenue"))
  }

  private def q5DimFirst(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    broadcast(r).join(n, col("r_regionkey") === col("n_regionkey"))
      .join(c, col("n_nationkey") === col("c_nationkey"))
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name"))
      .agg(decToDouble(sum(decP(col("l_extendedprice")) * decR(lit(1) - col("l_discount"))))
        .as("revenue"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.localFromEnv("graft-starjoin-ab")
    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q3_fact_first" -> (() => q3FactFirst(spark, sfDir)),
      "q3_dim_first" -> (() => q3DimFirst(spark, sfDir)),
      "q5_fact_first" -> (() => q5FactFirst(spark, sfDir)),
      "q5_dim_first" -> (() => q5DimFirst(spark, sfDir)))
    variants.foreach { case (_, b) => once(b()) } // warmups
    val walls = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (n, b) <- variants)
      walls(n) = walls(n) :+ once(b())
    variants.foreach { case (n, _) =>
      val ws = walls(n)
      println(f"$n%-16s median ${BenchUtil.median(ws)}%.3f  " +
        f"runs ${ws.map(w => f"$w%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
