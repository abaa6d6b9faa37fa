package graft

/** Catalog entries for the transform layer (SURVEY §2.4-2.6). */
object TransformQueries {
  val all: Seq[Queries.Q] = Seq.empty
}
