package graft.operators

import graft.QueryDef

/** G7 similarity-search operators (filled in incrementally). */
object Similarity {
  def defs: Seq[QueryDef] = Seq()
}
