package graft.operators

import graft.QueryDef

/** G7 text-analysis operators (filled in incrementally). */
object TextAnalysis {
  def defs: Seq[QueryDef] = Seq()
}
