package graft.util

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftTestSpark

/** Stage-then-swap discipline for small derived dirs (the index census and
  * compacted subtables): readers always resolve a COMPLETE state, and every
  * crash window between the renames is repairable. */
class SwapDirSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def fsFor(path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def writeMarker(dir: String, name: String): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    java.nio.file.Files.write(d.toPath.resolve(name), name.getBytes("UTF-8")): Unit
  }

  private def markerIn(p: Path): String = {
    val files = new java.io.File(p.toUri.getPath).listFiles()
    assert(files != null && files.length == 1)
    files.head.getName
  }

  test("swapIn replaces the live dir; readPath follows live") {
    val base = GraftTestSpark.tmpDir("swapdir")
    val (f, live) = fsFor(s"$base/t")
    SwapDir.swapIn(f, live)(tmp => writeMarker(tmp, "v1"))
    assert(markerIn(SwapDir.readPath(f, live)) === "v1")
    SwapDir.swapIn(f, live)(tmp => writeMarker(tmp, "v2"))
    assert(markerIn(SwapDir.readPath(f, live)) === "v2")
    assert(!f.exists(new Path(s"$base/t.bak")) && !f.exists(new Path(s"$base/t.tmp")),
      "no backup or tmp residue after a clean swap")
  }

  test("crash between the renames: readPath serves the backup, recover restores it") {
    val base = GraftTestSpark.tmpDir("swapdir")
    val (f, live) = fsFor(s"$base/t")
    SwapDir.swapIn(f, live)(tmp => writeMarker(tmp, "v1"))
    // simulate the crash window: live renamed away, replacement not yet in
    assert(f.rename(live, new Path(s"$base/t.bak")))
    assert(markerIn(SwapDir.readPath(f, live)) === "v1",
      "a reader mid-crash-window must still see the old complete state")
    SwapDir.recover(f, live)
    assert(f.exists(live) && markerIn(live) === "v1")
    assert(!f.exists(new Path(s"$base/t.bak")))
  }

  test("a stale tmp from an aborted attempt is ignored and cleaned") {
    val base = GraftTestSpark.tmpDir("swapdir")
    val (f, live) = fsFor(s"$base/t")
    SwapDir.swapIn(f, live)(tmp => writeMarker(tmp, "v1"))
    writeMarker(s"$base/t.tmp", "half-written")
    assert(markerIn(SwapDir.readPath(f, live)) === "v1")
    SwapDir.swapIn(f, live)(tmp => writeMarker(tmp, "v2"))
    assert(markerIn(live) === "v2")
    assert(!f.exists(new Path(s"$base/t.tmp")))
  }

  test("fileCount counts data files only, 0 for a missing dir") {
    val base = GraftTestSpark.tmpDir("swapdir")
    val (f, live) = fsFor(s"$base/t")
    assert(SwapDir.fileCount(f, live) === 0)
    writeMarker(s"$base/t", "part-0")
    writeMarker(s"$base/t", "_SUCCESS")
    writeMarker(s"$base/t", ".hidden")
    assert(SwapDir.fileCount(f, live) === 1)
  }
}
