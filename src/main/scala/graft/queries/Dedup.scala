package graft.queries

import graft.GraftQuery

object Dedup {
  def defs: Seq[GraftQuery] = Seq.empty
}
