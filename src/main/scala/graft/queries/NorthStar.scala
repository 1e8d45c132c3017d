package graft.queries

import graft.QuerySpec

/** North-star LLM-data-pipeline operators (SURVEY.md §7.4) — filled in
  * incrementally; each entry follows the same queries/oracle discipline.
  */
object NorthStar {
  val all: Seq[QuerySpec] = Seq()
}
