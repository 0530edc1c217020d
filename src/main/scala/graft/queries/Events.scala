package graft.queries

import graft.GraftQuery

object Events {
  def defs: Seq[GraftQuery] = Seq.empty
}
