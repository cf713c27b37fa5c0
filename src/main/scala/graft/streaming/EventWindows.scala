package graft.streaming

import graft.QueryDef

/** G6 event-time windowing (filled in incrementally). */
object EventWindows {
  def defs: Seq[QueryDef] = Seq()
}
