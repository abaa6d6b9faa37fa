package graft

/** Catalog entries for the filter layer (SURVEY §2.2-2.3). Populated as
  * operators land; see graft.filters.FilterCompiler.
  */
object FilterQueries {
  val all: Seq[Queries.Q] = Seq.empty
}
