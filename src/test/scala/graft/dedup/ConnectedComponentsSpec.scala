package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  /** In-JVM union-find reference (shared). */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] =
    graft.UnionFindRef.minLabels((0L until n.toLong), edges)

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("random graph matches union-find") {
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val got = run(edges)
    val want = unionFind(n, edges)
    // components() labels only nodes present in edges
    val present = edges.flatMap(e => Seq(e._1, e._2)).toSet
    assert(got.keySet == present)
    got.foreach { case (id, comp) => assert(comp == want(id), s"node $id") }
  }

  test("worst-case chain converges via pointer doubling") {
    val n = 256
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "every chain node labels to the min id")
  }

  test("self-loops, duplicate and reversed edges are tolerated") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (2L, 3L), (5L, 4L))
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("empty edge list yields empty labeling") {
    assert(run(Seq.empty).isEmpty)
  }

  test("self-loop-only nodes label as their own component") {
    // Node 7's only edge is (7,7): it must still get a row (component 7),
    // not silently vanish with the filtered self-loops.
    val edges = Seq((7L, 7L), (1L, 2L))
    assert(run(edges) == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("reliable-checkpoint mode (checkpointDir) matches localCheckpoint mode") {
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    val local = run(edges)
    val reliable = ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b", checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local)
    // The reliable mode actually materialized state into the directory...
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "reliable checkpoint wrote no files")
    // ...and cleaned up every superseded round: only the returned labels'
    // checkpoint may survive (an iterative operator must not leak ~3
    // materialized copies per round on a long-lived cluster).
    val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-")).count()
    assert(rddDirs <= 1, s"superseded round checkpoints must be deleted, found $rddDirs")
  }

  test("reliable-checkpoint files are cleaned up even when the call throws") {
    val dir = java.nio.file.Files.createTempDirectory("cc-fail").toString
    // a 6-node chain cannot converge in one round -> the require throws
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ConnectedComponents.components(edges, "a", "b", maxIter = 1, checkpointDir = Some(dir))
    }
    // a failed call must strand nothing — not even its cc-* scope dir
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files === 0, "failed call leaked checkpoint files")
  }

  test("per-call checkpoint scoping keeps a later call off an earlier call's files") {
    val dir = java.nio.file.Files.createTempDirectory("cc-scope").toString
    val first = ConnectedComponents
      .components(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b",
        checkpointDir = Some(dir))
    val second = ConnectedComponents
      .components(Seq((10L, 20L)).toDF("a", "b"), "a", "b", checkpointDir = Some(dir))
    // each call lives in its own cc-<uuid> subdir...
    val ccDirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("cc-")).count()
    assert(ccDirs === 2, "calls must not share a checkpoint scope")
    // ...so the second call's round cleanup cannot have claimed the files
    // backing the first call's returned frame
    assert(first.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(second.as[(Long, Long)].collect().toMap === Map(10L -> 10L, 20L -> 10L))
  }

  test("t_dup_clusters: planted chain A~B~C clusters together without A~C edge") {
    // Cluster semantics vs greedy pair-drop: build pairs directly.
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("a_id", "b_id")
    val cc = ConnectedComponents.components(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 40L, 50L -> 40L))
  }

  test("driver fast path and distributed fixpoint are byte-identical (r13)") {
    // The default path collects bounded edge lists and union-finds on the
    // driver; cap = 0 forces every call through the distributed engine.
    // Random graphs over several densities must label IDENTICALLY —
    // including chains (path compression), cliques, self-loops, isolated
    // self-loop nodes and duplicate/reversed edges.
    val rnd = new scala.util.Random(13)
    for (density <- Seq(0.3, 1.0, 2.5)) {
      val n = 120
      val m = (n * density).toInt
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
        Seq((77L, 77L)) // self-loop-only node
      val df = edges.toDF("a", "b")
      val fast = ConnectedComponents.components(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      val dist = ConnectedComponents
        .componentsBounded(df, "a", "b", 30, None, cap = 0)
        .as[(Long, Long)].collect().toMap
      assert(fast === dist, s"fast path diverged at density $density")
    }
  }

  test("driver fast path falls back to the distributed engine past the cap") {
    val pairs = Seq((1L, 2L), (2L, 3L), (9L, 9L)).toDF("a", "b")
    val out = ConnectedComponents.componentsBounded(pairs, "a", "b", 30, None, cap = 2)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }
}
