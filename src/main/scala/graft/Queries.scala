package graft

import graft.queries.{CoreQueries, ExtQueries}

/** Assembles the full driver-contract query inventory.
  * Core = SURVEY.md §2.12 (43 queries); Ext = LLM-pipeline operators
  * (dedup / similarity / text analysis).
  */
object Queries {
  def all: Seq[Q] = CoreQueries.all ++ ExtQueries.all

  def duplicateNames: Seq[String] =
    all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }.toSeq
}
