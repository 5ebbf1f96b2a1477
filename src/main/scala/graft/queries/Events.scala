package graft.queries
import graft.Q
object Events {
  val defs: Map[String, Q] = Map()
}
