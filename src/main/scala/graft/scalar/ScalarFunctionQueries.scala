package graft.scalar
import graft.Q
object ScalarFunctionQueries { val all: Seq[Q] = Seq() }
