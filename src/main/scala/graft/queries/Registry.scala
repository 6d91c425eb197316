package graft.queries

/** Aggregated query registry — the engine's operator-coverage surface.
  * SURVEY.md §2 parity (HederaParity), general relational (Relational), and
  * the training-data-pipeline extensions (TextQueries, VectorQueries).
  */
object Registry {
  val all: Seq[Q] =
    HederaParity.all ++ Relational.all ++ TextQueries.all ++ VectorQueries.all

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")

  val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
  val headline: Seq[Q] = all.filter(_.headline)
}
