package graft.queries

import graft.GraftQuery

object Multimodal {
  def defs: Seq[GraftQuery] = Seq.empty
}
