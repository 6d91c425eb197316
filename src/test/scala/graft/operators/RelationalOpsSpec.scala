package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark
import graft.operators.RelationalOps._

class RelationalOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("duplicateGroups finds multiplicity > 1 only") {
    val df = Seq(1, 1, 2, 3, 3, 3).toDF("k")
    val got = duplicateGroups(df, Seq("k")).as[(Int, Long)].collect().toMap
    assert(got === Map(1 -> 2L, 3 -> 3L))
  }

  test("dedupKeepFirst keeps the first row by order, deterministically") {
    val df = Seq((1, "b"), (1, "a"), (2, "z")).toDF("k", "v")
    val got = dedupKeepFirst(df, Seq("k"), Seq(col("v")))
      .as[(Int, String)].collect().toSet
    assert(got === Set((1, "a"), (2, "z")))
  }

  test("upsert replaces matched keys and inserts new ones") {
    val state = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    val updates = Seq(("b", "20"), ("c", "3")).toDF("k", "v")
    val got = upsert(state, updates, "k").as[(String, String)].collect().toMap
    assert(got === Map("a" -> "1", "b" -> "20", "c" -> "3"))
  }

  test("replaceWhere swaps only the matching slice") {
    val df = Seq(1, 2, 3, 4).toDF("x")
    val replacement = Seq(30, 40).toDF("x")
    val got = replaceWhere(df, col("x") >= 3, replacement).as[Int].collect().toSet
    assert(got === Set(1, 2, 30, 40))
  }

  test("exactSum is partition-order independent") {
    val vals = (1 to 1000).map(i => i * 0.01)
    val a = vals.toDF("v").repartition(13)
    val b = vals.reverse.toDF("v").repartition(3)
    val sa = a.agg(exactSum(col("v"))).first().getDouble(0)
    val sb = b.agg(exactSum(col("v"))).first().getDouble(0)
    assert(sa === sb)
    assert(math.abs(sa - 5005.0) < 1e-9)
  }

  test("asOfJoin attaches the latest right row at-or-before each left time") {
    // right: key a has states at t=10 (v=1), t=20 (v=2); key b at t=50
    val right = Seq(("a", 10L, 1), ("a", 20L, 2), ("b", 50L, 9)).toDF("rk", "rt", "v")
    // left probes: before any state, exactly at, between, after; key with
    // no right rows at all; key whose only state is later
    val left = Seq(
      ("a", 5L, "before"), ("a", 10L, "at"), ("a", 15L, "between"),
      ("a", 99L, "after"), ("c", 10L, "nokey"), ("b", 49L, "early")
    ).toDF("lk", "lt", "tag")
    val got = asOfJoin(left, right, "lk", "rk", col("lt"), col("rt"), Seq("v"))
      .select("tag", "v").as[(String, Int)].collect().toMap
    assert(got === Map("at" -> 1, "between" -> 1, "after" -> 2))
    // 'before', 'nokey', 'early' have no match and are dropped (inner asof)
  }

  test("asOfJoin never matches NULL keys to each other (SQL join semantics)") {
    val right = Seq((Option.empty[String], 5L, 1)).toDF("rk", "rt", "v")
    val left = Seq((Option.empty[String], 10L, "nullkey")).toDF("lk", "lt", "tag")
    assert(asOfJoin(left, right, "lk", "rk", col("lt"), col("rt"), Seq("v")).count() === 0)
  }

  test("rangeJoinPairs finds exactly the pairs within the radius, once each") {
    // key a times 0,95,100,205 at radius 100: (0,100) is boundary-inclusive,
    // (95,100) spans a bucket edge, (100,205) and (95,205) exceed the radius
    val df = Seq(("a", 1L, 0L), ("a", 2L, 95L), ("a", 3L, 100L), ("a", 4L, 205L),
      ("b", 5L, 50L)).toDF("k", "id", "t")
    val got = rangeJoinPairs(df, "k", "id", col("t"), radius = 100L)
      .select("a_id", "b_id", "gap").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 95L), (1L, 3L, 100L), (2L, 3L, 5L)))
  }

  test("round6 matches decimal half-up on representable values") {
    val got = Seq(0.1234564, 0.1234566, 1.0, 0.0)
      .toDF("v").select(round6(col("v"))).as[Double].collect()
    assert(got.toSeq === Seq(0.123456, 0.123457, 1.0, 0.0))
  }

  test("exactNtile ≡ the global ntile window, for ragged totals, ties, and total < n") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.ntile
    // sizes hit every arithmetic branch: total < n, total % n ∈ {0, ±1},
    // and a size spanning many range partitions; values collide heavily so
    // the id tiebreak is load-bearing
    for ((rows, n) <- Seq((3, 5), (100, 5), (101, 4), (96, 4), (1000, 7))) {
      val df = (0 until rows).map(i => ((i * 37) % 11, i.toLong)).toDF("v", "id")
      val want = df
        .withColumn("t", ntile(n).over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
        .as[(Int, Long, Long)].collect().toSet
      val got = exactNtile(df, n, Seq(col("v").asc, col("id").asc), "t")
        .as[(Int, Long, Long)].collect().toSet
      assert(got === want, s"rows=$rows n=$n")
    }
  }
}
