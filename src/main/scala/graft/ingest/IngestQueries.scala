package graft.ingest
import graft.Q
object IngestQueries { val all: Seq[Q] = Seq() }
