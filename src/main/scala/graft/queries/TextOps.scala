package graft.queries
import graft.Q
object TextOps {
  val defs: Map[String, Q] = Map()
}
