package graft.ops

import org.apache.spark.rdd.RDD

/** k-core decomposition by iterative peel: repeatedly remove nodes
  * whose degree in the INDUCED subgraph is < k until the set is stable
  * — the graph family's density/community member (VERDICT r14 #7; the
  * Seidman 1983 cohesion subgraph, Batagelj-Zaveršnik's peel made
  * level-synchronous for distribution, the Components/Bfs lineage
  * discipline). Returns the surviving nodes with their core-induced
  * degrees (all ≥ k by construction) — a unique set for a given graph
  * and k (the k-core is the unique maximal subgraph with min degree
  * ≥ k; the peel order cannot change it), so no tie-break is needed.
  *
  * Execution shape (the [[Bfs]] planning-floor lesson, r15): rounds
  * run as RDD operations over the staged partitioner-pinned adjacency
  * — zero Catalyst work per round. Each round streams the edge
  * partitions through two membership probes (u-side partition-local
  * via zipPartitions; v-side after re-keying the surviving half-edges
  * by v) and min-degree-filters the count rollup: two keyed shuffles
  * per round, both sized by the induced edge set, which only SHRINKS
  * as the peel proceeds. Monotonicity makes the fixpoint test free:
  * the set only loses nodes, so |N| unchanged ⇔ N unchanged.
  *
  * The `maxRounds` admission guard fails loudly on non-convergence —
  * degenerate peels (long chains) can need O(|V|) rounds, and at that
  * shape the caller wants the bucket/ECL-style k-core that peels many
  * levels per round, not this one.
  */
object KCore {

  /** edges: (u → (v, w)) symmetric, distinct pairs, hash-partitioned
    * (the [[graft.queries.Extra23.stagedGraphRdd]] contract; weights
    * ignored — degree counts distinct neighbors because pairs are
    * distinct). Returns (node, induced degree) of the k-core.
    */
  def kCoreRdd(edges: RDD[(Long, (Long, Long))], k: Int,
      maxRounds: Int = 20): RDD[(Long, Long)] = {
    require(k >= 1, s"kCoreRdd: k must be >= 1, got $k")
    val part = edges.partitioner.getOrElse(
      new org.apache.spark.HashPartitioner(edges.getNumPartitions))

    // Induced degree of every u whose endpoints BOTH survive in `alive`.
    def induced(alive: RDD[(Long, Long)]): RDD[(Long, Long)] = {
      // u-side probe is partition-local (alive shares the partitioner).
      val half = edges.zipPartitions(alive, preservesPartitioning = false) {
        (eit, nit) =>
          val s = new java.util.HashSet[java.lang.Long]()
          nit.foreach { case (n, _) => s.add(n) }
          eit.flatMap { case (u, (v, _)) =>
            if (s.contains(u)) Iterator((v, u)) else Iterator.empty
          }
      }
      // v-side probe after one re-key; count back on u (one combine
      // shuffle — map-side partial counts, the two-phase agg shape).
      half.partitionBy(part)
        .zipPartitions(alive, preservesPartitioning = false) { (eit, nit) =>
          val s = new java.util.HashSet[java.lang.Long]()
          nit.foreach { case (n, _) => s.add(n) }
          eit.flatMap { case (v, u) =>
            if (s.contains(v)) Iterator((u, 1L)) else Iterator.empty
          }
        }
        .reduceByKey(part, _ + _)
    }

    // Start from full degrees (one combine rollup, partitioner kept).
    var alive = edges.mapValues(_ => 1L).reduceByKey(part, _ + _)
      .filter(_._2 >= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var n = alive.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = induced(alive).filter(_._2 >= k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = next.count() // materializes; fixpoint test; guard anchor
      // Peel is monotone — induced() emits only members of `alive`, so
      // next ⊆ alive and equal COUNTS imply equal SETS; an unchanged
      // set has every induced degree ≥ k, i.e. it IS the k-core (the
      // peel preserves the k-core at every step, so the fixpoint
      // reached from the full node set is the maximal such subgraph).
      if (m == n) converged = true
      alive.unpersist(false)
      alive = next
      n = m
      rounds += 1
      if (n == 0) converged = true // empty core is stable by definition
    }
    require(converged,
      s"kCoreRdd: peel did not converge within $maxRounds rounds " +
        s"($n nodes still changing) — at this scale use a bucketed " +
        "multi-level peel (ECL-style k-core)")
    alive
  }
}
