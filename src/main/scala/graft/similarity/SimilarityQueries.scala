package graft.similarity
import graft.Q
object SimilarityQueries { val all: Seq[Q] = Seq() }
