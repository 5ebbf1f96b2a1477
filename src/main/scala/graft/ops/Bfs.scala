package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search: minimum hop distance from a source
  * SET to every reachable node, bounded by `maxHops` — the graph
  * traversal a lineage/blast-radius/contamination question runs over a
  * big bipartite fact graph ("everything within k hops of these seeds").
  *
  * Why frontier expansion and not [[Components]]' label propagation:
  * BFS needs the DISTANCE, not the partition — min-label propagation
  * converges to the same components but destroys hop counts, and
  * pointer jumping (its O(log d) accelerator) is exactly the move that
  * makes distances wrong. Level-synchronous frontier expansion IS the
  * textbook distributed BFS (Pregel's canonical example): each round
  * joins only the CURRENT frontier against the edge relation, so total
  * work is O(Σ frontier-adjacent edges), never rounds × |E|.
  *
  * Scale shape per round: one equi-join frontier⋈edges on the source
  * endpoint (the edge relation is persisted across rounds — built once,
  * re-joined per hop), one distinct on the discovered endpoints, one
  * anti-join against the visited set. All keyed shuffles on node ids —
  * no broadcast of anything corpus-sized, no driver-side collection;
  * the per-round `count()` is the checkpoint-materialization action and
  * doubles as the termination test and the frontier admission guard
  * (the [[graft.Q.requireAtMost]] discipline: a frontier beyond
  * `maxFrontier` fails loudly instead of silently launching a
  * memory-crushing round — at that size the caller wants the
  * direction-optimizing/bitmap BFS variant, not this one).
  *
  * Lineage: each round's frontier and the accumulated distance table
  * are lazily `localCheckpoint`ed (the [[Components]] discipline — the
  * union/anti-join tower would otherwise double the logical plan per
  * round); the count above is the one job that materializes both.
  *
  * Determinism: BFS distance is a pure min over paths — no tie-break
  * needed; the output (node, dist) set is unique for a given graph and
  * source set regardless of partitioning or edge order.
  */
object Bfs {

  /** edges(u, v) DIRECTED (symmetrize first for undirected graphs),
    * sources(node) → (node, dist) for every node within `maxHops` of
    * some source (sources themselves at dist 0, minimum distance wins).
    */
  def multiSourceBfs(edges: DataFrame, sources: DataFrame, maxHops: Int,
      maxFrontier: Long = 1L << 27): DataFrame = {
    require(maxHops >= 0, s"multiSourceBfs: maxHops must be >= 0, got $maxHops")
    // Spread + persist the edge relation once: it is re-joined every
    // round, and hash-partitioning it by the probe endpoint lets each
    // round's frontier join reuse the layout (the frontier side is the
    // small side and re-shuffles; the big edge side never moves again).
    val e = graft.Q.spreadBy(edges.select(col("u"), col("v")), "u")
      .transform(graft.Q.sketchPersist)
    var visited = sources.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint() // eager: tiny, and every round anti-joins it
    var frontier = visited.select("node")
    var hop = 1
    var exhausted = false
    while (hop <= maxHops && !exhausted) {
      val next = frontier.select(col("node").as("u"))
        .join(e, "u")
        .select(col("v").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(hop.toLong).as("dist"))
        .localCheckpoint(eager = false)
      val n = next.count() // materializes the checkpoint; terminates; guards
      require(n <= maxFrontier,
        s"multiSourceBfs: hop-$hop frontier has $n nodes, exceeding the " +
          s"declared bound of $maxFrontier — at this scale use a " +
          "direction-optimizing / bitmap-frontier BFS")
      if (n == 0) exhausted = true
      else {
        visited = visited.union(next).localCheckpoint(eager = false)
        frontier = next.select("node")
      }
      hop += 1
    }
    e.unpersist()
    visited
  }
}
