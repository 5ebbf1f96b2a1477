package graft.queries
import graft.Q
object Scalars {
  val defs: Map[String, Q] = Map()
}
