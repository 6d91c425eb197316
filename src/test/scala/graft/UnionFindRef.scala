package graft

/** In-JVM union-find reference shared by the connected-components specs
  * (ConnectedComponentsSpec, PropertiesSpec, NoOracleEquivalenceSpec):
  * min-id label per component over the given node set. Edges touching
  * nodes outside `nodes` and self-loops are ignored. */
object UnionFindRef {
  def minLabels(nodes: Iterable[Long], edges: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.toSeq.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      if (a != b && parent.contains(a) && parent.contains(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val minOf = parent.keys.groupBy(find).map { case (r, xs) => r -> xs.min }
    parent.keys.map(n => n -> minOf(find(n))).toMap
  }
}
