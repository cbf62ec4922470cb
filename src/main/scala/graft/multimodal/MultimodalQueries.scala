package graft.multimodal
import graft.Q
object MultimodalQueries { val all: Seq[Q] = Seq() }
