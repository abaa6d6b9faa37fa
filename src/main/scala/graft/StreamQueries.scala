package graft

/** Catalog entries for delivery semantics (SURVEY §2.7). */
object StreamQueries {
  val all: Seq[Queries.Q] = Seq.empty
}
