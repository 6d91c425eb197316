package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class SequencePackSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  private def pack(rows: Seq[(String, Long, Long)], budget: Long): Map[Long, Long] =
    SequencePack.greedyPack(
        rows.toDF("lang", "doc_id", "n_tokens"), "lang", "doc_id", "n_tokens", budget)
      .select("ord", "pack_id").as[(Long, Long)].collect().toMap

  test("greedy first-fit: packs fill to the budget, never past it") {
    // shard a: 300+200=500 fits; +100 would exceed -> new pack; 512 alone
    // overflows its own pack (oversized doc rule)
    val rows = Seq(
      ("a", 1L, 300L), ("a", 2L, 200L), ("a", 3L, 100L), ("a", 4L, 600L), ("a", 5L, 10L),
      ("b", 10L, 512L), ("b", 11L, 1L))
    val got = pack(rows, budget = 512)
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
      10L -> 0L, 11L -> 1L))
  }

  test("shard-change tracking is order-robust: one partition, many shards") {
    // force everything into few partitions so the pass must detect shard
    // boundaries itself (plus pack ids restart per shard)
    val rows = (0 until 50).map(i => (s"s${i % 7}", i.toLong, 200L))
    val got = SequencePack.greedyPack(
        rows.toDF("lang", "doc_id", "n_tokens").coalesce(1),
        "lang", "doc_id", "n_tokens", 512)
      .select("shard", "ord", "pack_id").as[(String, Long, Long)].collect()
    // 200+200=400 fits, +200 exceeds: packs of 2 docs in visit order per shard
    got.groupBy(_._1).foreach { case (_, docs) =>
      docs.sortBy(_._2).zipWithIndex.foreach { case ((_, _, packId), idx) =>
        assert(packId === idx / 2, s"doc #$idx in shard must sit in pack ${idx / 2}")
      }
    }
  }

  test("null shard key behaves like any other shard") {
    // The partition pass starts with a null-initialized shard var: a genuine
    // null shard's first row must still take the shard-reset branch (null ==
    // null would otherwise skip it and mis-number the first pack).
    val rows = Seq((null: String, 1L, 600L), (null: String, 2L, 100L), ("a", 3L, 600L))
    val got = SequencePack.greedyPack(
        rows.toDF("lang", "doc_id", "n_tokens").coalesce(1),
        "lang", "doc_id", "n_tokens", 512)
      .select("ord", "pack_id").as[(Long, Long)].collect().toMap
    // oversized first doc occupies pack 0 alone in BOTH shards; the null
    // shard's second doc opens pack 1
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 0L))
  }

  test("in-JVM reference equivalence on random inputs") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map(i =>
      (s"s${rnd.nextInt(5)}", i.toLong, (1 + rnd.nextInt(400)).toLong))
    val got = pack(rows, budget = 512)
    val want = rows.groupBy(_._1).flatMap { case (_, docs) =>
      var fill = 0L; var pk = -1L
      docs.sortBy(_._2).map { case (_, id, n) =>
        if (pk < 0 || fill + n > 512) { pk += 1; fill = n } else fill += n
        id -> math.max(pk, 0L)
      }
    }
    assert(got === want)
  }
}
