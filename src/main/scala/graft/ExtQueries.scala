package graft

/** Catalog entries for the north-star analytics operators (SURVEY §7.7):
  * dedup, similarity search, multimodal, text analysis.
  */
object ExtQueries {
  val all: Seq[Queries.Q] = Seq.empty
}
