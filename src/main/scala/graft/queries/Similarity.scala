package graft.queries

import graft.GraftQuery

object Similarity {
  def defs: Seq[GraftQuery] = Seq.empty
}
