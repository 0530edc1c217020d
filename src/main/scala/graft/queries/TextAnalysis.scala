package graft.queries

import graft.GraftQuery

object TextAnalysis {
  def defs: Seq[GraftQuery] = Seq.empty
}
