package graft.dedup
import graft.Q
object DedupQueries { val all: Seq[Q] = Seq() }
