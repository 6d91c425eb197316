package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed binary logistic regression by full-batch gradient descent —
  * the trainable upgrade of the fixed-weight quality classifier
  * (t_quality_classifier): a curation org hand-labels a slice (or derives
  * labels from metadata) and TRAINS the keep/drop rule instead of
  * hand-tuning it. The fastText-style quality filter every LLM data
  * pipeline runs, re-expressed Spark-first.
  *
  * Scale design (the part that must survive 100 TB):
  *  - each round is ONE partial-aggregable job over the feature frame —
  *    the shuffle carries (d+2) decimal partial sums PER PARTITION, never
  *    rows; driver state is O(d) weights per round. Rounds are a small
  *    constant (single-digit epochs are the norm for convex GLMs on
  *    corpus-scale data).
  *  - the caller materializes the feature frame ONCE (`train` takes
  *    features, not text): at bench SF a localCheckpoint suffices; a
  *    100 TB run persists the (id, label, d longs) projection — ~100×
  *    smaller than the corpus — and every round re-reads THAT, never the
  *    text.
  *
  * Engine-exact arithmetic (what lets an iterative trainer carry a
  * byte-for-byte DuckDB oracle, the KMeans/PageRank discipline):
  *  - features and weights live on the 1e6 integer grid (micro units);
  *    the per-doc logit `zp = w·x` is exact BIGINT arithmetic.
  *  - the link is the ALGEBRAIC fast sigmoid σ(z) = 0.5 + z / (2 + 2|z|):
  *    IEEE requires division to be correctly rounded, so any engine
  *    reproduces it bit-for-bit — `exp()` carries no such guarantee,
  *    which is why the textbook logistic link cannot be oracle-exact.
  *  - gradient sums are exact integer aggregates (Spark DECIMAL(38,0) /
  *    DuckDB HUGEINT); the weight update converts them to double (exact
  *    below 2^53 — at larger corpora the last bits of the STEP round,
  *    which perturbs training trajectories but never correctness of a
  *    given trajectory) through the identical floor(x + 0.5) sequence on
  *    both engines.
  */
object LogisticRegression {

  final case class Model(weightsMicro: Array[Long]) {
    require(weightsMicro.nonEmpty)
    /** Intercept first, then one weight per feature column. */
    def interceptMicro: Long = weightsMicro.head
  }

  private val Micro = 1000000L
  private val Micro2 = 1e12

  /** Fast-sigmoid probability on the 1e6 grid from a micro²-scaled logit
    * column: floor((0.5 + z/(2 + 2|z|)) · 1e6 + 0.5), z = zp / 1e12.
    * Every step is a correctly-rounded IEEE op on values exact below 2^53,
    * so the oracle's identical SQL sequence matches bit-for-bit. */
  def pMicro(zpMicro2: Column): Column = {
    val z = zpMicro2.cast("double") / Micro2
    floor((lit(0.5) + z / (lit(2.0) + lit(2.0) * abs(z))) * Micro.toDouble
      + lit(0.5)).cast("long")
  }

  /** The same link as DuckDB SQL over a micro²-scaled BIGINT expression. */
  def pMicroSql(zp: String): String =
    s"CAST(floor((0.5 + (CAST($zp AS DOUBLE) / 1000000000000.0) / " +
      s"(2.0 + 2.0 * abs(CAST($zp AS DOUBLE) / 1000000000000.0))) " +
      s"* 1000000.0 + 0.5) AS BIGINT)"

  private def zpColumn(w: Array[Long], featureCols: Seq[String]): Column =
    featureCols.zipWithIndex
      .map { case (c, j) => col(c) * lit(w(j + 1)) }
      .foldLeft(lit(w(0) * Micro): Column)(_ + _)

  /** Train by `rounds` full-batch GD epochs from zero weights.
    *
    * @param features    one row per example: `labelCol` ∈ {0, 1} and each
    *                    feature column a micro-grid long in a bounded range
    *                    (|x| ≤ ~1e6·scale; quality features live in [0, 1e6])
    * @param lrMicro     learning rate on the 1e6 grid (4e6 = 4.0)
    * @return weights on the micro grid, intercept first
    */
  def train(features: DataFrame, labelCol: String, featureCols: Seq[String],
      rounds: Int, lrMicro: Long): Model = {
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")
    require(featureCols.nonEmpty, "need at least one feature")
    val d = featureCols.size
    val w = Array.fill(d + 1)(0L)
    var r = 0
    while (r < rounds) {
      val resid = pMicro(zpColumn(w, featureCols)) -
        col(labelCol).cast("long") * Micro
      // exact integer sums: intercept gradient uses x0 = 1e6
      val aggs =
        (sum((resid * Micro).cast("decimal(38,0)")).as("g0") +:
          featureCols.zipWithIndex.map { case (c, j) =>
            sum((resid * col(c)).cast("decimal(38,0)")).as(s"g${j + 1}")
          }) :+ count(lit(1)).as("n")
      val row = features.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(d + 1)
      require(n > 0, "empty training frame")
      var j = 0
      while (j <= d) {
        val g = row.getDecimal(j).doubleValue() // exact below 2^53
        w(j) = w(j) - math.floor(
          lrMicro.toDouble * g / (n.toDouble * Micro2) + 0.5).toLong
        j += 1
      }
      r += 1
    }
    Model(w)
  }

  /** Train one model PER GROUP (per-language, per-source, per-domain
    * quality classifiers — the standard shape: quality feature weights
    * differ by language) in a SINGLE distributed pass per epoch: the
    * per-group gradients are one `groupBy(groupCol)` partial-aggregable
    * job, so training k models costs the same shuffle as training one.
    * Driver state is O(groups · d); `maxGroups` keeps the per-epoch
    * collect bounded by contract (groups are languages/sources — small
    * cardinality by nature; a million-group call is a bug, not a
    * workload).
    *
    * Same fixed-point arithmetic as [[train]], applied per group — each
    * group's trajectory is EXACTLY what [[train]] would produce on that
    * group's rows alone (pinned by LogisticRegressionSpec), so the
    * grouped oracle unrolls the same CTEs with a GROUP BY.
    */
  def trainGrouped(features: DataFrame, groupCol: String, labelCol: String,
      featureCols: Seq[String], rounds: Int, lrMicro: Long,
      maxGroups: Int = 10000): Map[String, Array[Long]] = {
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")
    require(featureCols.nonEmpty, "need at least one feature")
    val d = featureCols.size
    val groups = features.select(col(groupCol).cast("string"))
      .distinct().limit(maxGroups + 1).collect().map(_.getString(0))
    require(groups.nonEmpty, "empty training frame")
    require(groups.length <= maxGroups,
      s"more than $maxGroups groups — grouped training collects O(groups·d) " +
        "per epoch; this cardinality needs a different design")
    require(!groups.contains(null), s"$groupCol must not be null")
    val w = scala.collection.mutable.Map(
      groups.map(g => g -> Array.fill(d + 1)(0L)).toSeq: _*)
    val spark = features.sparkSession
    var r = 0
    while (r < rounds) {
      // weights as a broadcast dimension joined on the group key: the
      // per-row logit reads its own group's weights, one map-side join.
      val wRows = w.toSeq.sortBy(_._1).map { case (g, ws) =>
        org.apache.spark.sql.Row.fromSeq(g +: ws.toSeq)
      }
      val wSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__g",
          org.apache.spark.sql.types.StringType, nullable = false) +:
          (0 to d).map(j => org.apache.spark.sql.types.StructField(
            s"__w$j", org.apache.spark.sql.types.LongType, nullable = false)))
      val wDf = spark.createDataFrame(
        spark.sparkContext.parallelize(wRows, 1), wSchema)
      val joined = features.join(broadcast(wDf),
        features(groupCol).cast("string") === wDf("__g"))
      val zp = featureCols.zipWithIndex
        .map { case (c, j) => col(c) * col(s"__w${j + 1}") }
        .foldLeft(col("__w0") * Micro: Column)(_ + _)
      val resid = pMicro(zp) - col(labelCol).cast("long") * Micro
      val aggs =
        (sum((resid * Micro).cast("decimal(38,0)")).as("g0") +:
          featureCols.zipWithIndex.map { case (c, j) =>
            sum((resid * col(c)).cast("decimal(38,0)")).as(s"g${j + 1}")
          }) :+ count(lit(1)).as("n")
      joined.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
        .collect().foreach { row =>
          val g = row.getString(0)
          val n = row.getLong(d + 2)
          val ws = w(g)
          var j = 0
          while (j <= d) {
            val grad = row.getDecimal(j + 1).doubleValue()
            ws(j) = ws(j) - math.floor(
              lrMicro.toDouble * grad / (n.toDouble * Micro2) + 0.5).toLong
            j += 1
          }
        }
      r += 1
    }
    w.toMap
  }

  /** Score a feature frame with per-group models from [[trainGrouped]]:
    * the group's weights join back as a broadcast dimension, then the
    * same per-row fast-sigmoid map as [[score]]. Rows whose group has no
    * model are a CONTRACT VIOLATION (an inner join would silently drop
    * them; a left join would emit silent nulls) — `requireCoverage`
    * counts them with one cheap anti-join on the broadcast dimension and
    * fails loudly (disable only when the caller filters first). */
  def scoreGrouped(features: DataFrame, groupCol: String,
      weights: Map[String, Array[Long]], featureCols: Seq[String],
      thresholdMicro: Long = 500000L,
      requireCoverage: Boolean = true): DataFrame = {
    require(weights.nonEmpty, "no models")
    val d = featureCols.size
    weights.foreach { case (g, ws) =>
      require(ws.length == d + 1,
        s"group $g has ${ws.length} weights for $d features")
    }
    val spark = features.sparkSession
    val wRows = weights.toSeq.sortBy(_._1).map { case (g, ws) =>
      org.apache.spark.sql.Row.fromSeq(g +: ws.toSeq)
    }
    val wSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__g",
        org.apache.spark.sql.types.StringType, nullable = false) +:
        (0 to d).map(j => org.apache.spark.sql.types.StructField(
          s"__w$j", org.apache.spark.sql.types.LongType, nullable = false)))
    val wDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(wRows, 1), wSchema))
    if (requireCoverage) {
      val missing = features
        .join(wDf, features(groupCol).cast("string") === wDf("__g"),
          "left_anti")
        .limit(1).count()
      require(missing == 0L,
        s"feature rows reference a $groupCol with no trained model — " +
          "train that group or filter before scoring")
    }
    val joined = features.join(wDf,
      features(groupCol).cast("string") === wDf("__g"))
    val zp = featureCols.zipWithIndex
      .map { case (c, j) => col(c) * col(s"__w${j + 1}") }
      .foldLeft(col("__w0") * Micro: Column)(_ + _)
    joined.withColumn("p_micro", pMicro(zp))
      .withColumn("keep", col("p_micro") >= thresholdMicro)
      .drop("__g" +: (0 to d).map(j => s"__w$j"): _*)
  }

  /** Score a feature frame with a trained model: per-row fast-sigmoid
    * probability on the 1e6 grid plus the keep decision at `thresholdMicro`.
    * Pure per-row map — zero shuffle. */
  def score(features: DataFrame, model: Model, featureCols: Seq[String],
      thresholdMicro: Long = 500000L): DataFrame = {
    require(model.weightsMicro.length == featureCols.size + 1,
      s"model has ${model.weightsMicro.length} weights for ${featureCols.size} features")
    val p = pMicro(zpColumn(model.weightsMicro, featureCols))
    features.withColumn("p_micro", p)
      .withColumn("keep", col("p_micro") >= thresholdMicro)
  }

  /** The grouped twin of [[trainCtes]]: unrolls [[trainGrouped]] as
    * DuckDB CTEs with a GROUP BY on `groupCol`. `featuresSql` must yield
    * (id, groupCol, y, featureCols); emits `lrf` and per-round weight
    * frames `w0..w<rounds>` with one row per group (columns: groupCol,
    * w0..wd). */
  def trainGroupedCtes(featuresSql: String, groupCol: String,
      featureCols: Seq[String], rounds: Int, lrMicro: Long): String = {
    val d = featureCols.size
    val sb = new StringBuilder
    sb ++= s"lrf AS MATERIALIZED (\n$featuresSql)"
    sb ++= s",\nw0 AS MATERIALIZED (SELECT DISTINCT $groupCol, " +
      (0 to d).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") +
      " FROM lrf)"
    for (r <- 1 to rounds) {
      val zp = (s"w.w0 * 1000000" +:
        featureCols.zipWithIndex.map { case (c, j) => s"w.w${j + 1} * f.$c" })
        .mkString(" + ")
      sb ++= s""",
        |p$r AS (
        |  SELECT f.*, ${pMicroSql(zp)} - f.y * 1000000 AS resid
        |  FROM lrf f JOIN w${r - 1} w ON f.$groupCol = w.$groupCol),
        |g$r AS (
        |  SELECT $groupCol, sum(CAST(resid * 1000000 AS HUGEINT)) AS g0,
        |    ${featureCols.zipWithIndex.map { case (c, j) =>
                 s"sum(CAST(resid * $c AS HUGEINT)) AS g${j + 1}" }
               .mkString(",\n    ")},
        |    count(*) AS n
        |  FROM p$r GROUP BY $groupCol),
        |w$r AS MATERIALIZED (
        |  SELECT w.$groupCol, ${(0 to d).map(j =>
                 s"w.w$j - CAST(floor($lrMicro.0 * CAST(g.g$j AS DOUBLE) / " +
                   s"(CAST(g.n AS DOUBLE) * 1000000000000.0) + 0.5) AS BIGINT) AS w$j")
               .mkString(",\n    ")}
        |  FROM w${r - 1} w JOIN g$r g ON w.$groupCol = g.$groupCol)""".stripMargin
    }
    sb.toString
  }

  /** The whole unrolled training run as DuckDB CTEs — the oracle
    * counterpart of [[train]] (the KMeans discipline: the oracle replays
    * every round, so a drift in ANY round's arithmetic breaks the match).
    * `featuresSql` must yield (id, y, <featureCols>) with y ∈ {0, 1} and
    * micro-grid BIGINT features. Emits CTEs `lrf` (the feature frame) and
    * `w0..w<rounds>` (1-row weight frames with columns w0..wd). */
  def trainCtes(featuresSql: String, featureCols: Seq[String],
      rounds: Int, lrMicro: Long): String = {
    val d = featureCols.size
    val sb = new StringBuilder
    // MATERIALIZED is load-bearing: every w_{r-1} is referenced twice
    // (by p_r and by w_r's update), so an inlining planner would expand
    // the chain 2^rounds times — materializing pins each round to run
    // exactly once (they are 1-row frames; lrf is scanned once per round).
    sb ++= s"lrf AS MATERIALIZED (\n$featuresSql)"
    sb ++= s",\nw0 AS MATERIALIZED (SELECT " +
      (0 to d).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ") + ")"
    for (r <- 1 to rounds) {
      val zp = (s"w.w0 * 1000000" +:
        featureCols.zipWithIndex.map { case (c, j) => s"w.w${j + 1} * f.$c" })
        .mkString(" + ")
      sb ++= s""",
        |p$r AS (
        |  SELECT f.*, ${pMicroSql(zp)} - f.y * 1000000 AS resid
        |  FROM lrf f, w${r - 1} w),
        |g$r AS (
        |  SELECT sum(CAST(resid * 1000000 AS HUGEINT)) AS g0,
        |    ${featureCols.zipWithIndex.map { case (c, j) =>
                 s"sum(CAST(resid * $c AS HUGEINT)) AS g${j + 1}" }
               .mkString(",\n    ")},
        |    count(*) AS n
        |  FROM p$r),
        |w$r AS MATERIALIZED (
        |  SELECT ${(0 to d).map(j =>
                 s"w.w$j - CAST(floor($lrMicro.0 * CAST(g.g$j AS DOUBLE) / " +
                   s"(CAST(g.n AS DOUBLE) * 1000000000000.0) + 0.5) AS BIGINT) AS w$j")
               .mkString(",\n    ")}
        |  FROM w${r - 1} w, g$r g)""".stripMargin
    }
    sb.toString
  }
}
