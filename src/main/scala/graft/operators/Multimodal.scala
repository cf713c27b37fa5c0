package graft.operators

import graft.QueryDef

/** Multimodal binary-column pipeline (filled in incrementally). */
object Multimodal {
  def defs: Seq[QueryDef] = Seq()
}
