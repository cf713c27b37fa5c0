package graft.operators

import graft.QueryDef

/** G7 deduplication operators (filled in incrementally). */
object Dedup {
  def defs: Seq[QueryDef] = Seq()
}
