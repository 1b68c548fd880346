package graft.queries

import graft.Q

/** Queries through the graft-kv DSv2 connector (the reference's core
  * surface). Populated once the connector lands — see graft.sources. */
object KvQueries {
  def defs: Seq[Q] = Seq()
}
