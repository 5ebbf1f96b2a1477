package graft.queries
import graft.Q
object Windows {
  val defs: Map[String, Q] = Map()
}
