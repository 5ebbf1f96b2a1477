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
  * — zero Catalyst work per round — in DELTA form: degrees start at
  * the full-graph rollup, and each round SUBTRACTS the edges leaving
  * the round's removed set instead of recounting the induced subgraph
  * (a recount is two corpus-sized shuffles per round; the delta is
  * ONE shuffle sized by the removed nodes' edges, and every edge is
  * processed at most once across the whole peel — the O(|E|) total
  * that makes Batagelj-Zaveršnik linear, kept in the distributed
  * form). The removed-set probe is partition-local (zipPartitions on
  * the shared partitioner); the decrement merge back into the live
  * degree table is narrow for the same reason. Per-round state is one
  * row per live node; the per-round count doubles as the termination
  * test and the guard anchor.
  *
  * The `maxRounds` admission guard fails loudly on non-convergence —
  * degenerate peels (long chains) can need O(|V|) rounds, and at that
  * shape the caller wants the bucket/ECL-style k-core that peels many
  * levels per round, not this one.
  */
object KCore {

  private val MemDisk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

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

    // Full degrees (one combine rollup, partitioner kept by filter).
    // alive/removed are LAZY FILTERS over the one persisted degree
    // table (r17): the previous form persisted both splits separately
    // and paid TWO sequential materialization counts at init
    // (StageProbe: 5.5 s + 2.4 s of task CPU before round 1); a narrow
    // filter over cached blocks costs a map per use, and one count
    // materializes everything round 1 needs.
    val deg0 = edges.mapValues(_ => 1L).reduceByKey(part, _ + _)
      .persist(MemDisk)
    var alive = deg0.filter(_._2 >= k)
    var removed = deg0.filter(_._2 < k)
    var pending = removed.count() // materializes deg0; terminates; guards
    var rounds = 0
    // The CURRENT persisted backing table (alive/removed are filters
    // over it) — never retired until superseded by the next round's.
    var table: RDD[(Long, Long)] = deg0
    val retired = scala.collection.mutable.ArrayBuffer[RDD[_]]()
    while (pending > 0 && rounds < maxRounds) {
      // Edges LEAVING this round's removed set (partition-local probe:
      // `removed` rides the shared partitioner), counted per far end —
      // the only shuffle of the round, sized by the removed nodes'
      // edges. Decrements onto dead targets are dropped by the merge
      // below (only live nodes are updated), and each removed node is
      // in exactly one round's set, so no edge is ever counted twice.
      val dec = edges.zipPartitions(removed, preservesPartitioning = false) {
        (eit, rit) =>
          val r = new java.util.HashSet[java.lang.Long]()
          rit.foreach { case (n, _) => r.add(n) }
          eit.flatMap { case (u, (v, _)) =>
            if (r.contains(u)) Iterator((v, 1L)) else Iterator.empty
          }
      }.reduceByKey(part, _ + _)
      // Narrow merge: subtract the decrements from the live table
      // (both sides on `part`), then split live/newly-dead.
      val next = alive.zipPartitions(dec, preservesPartitioning = true) {
        (ait, dit) =>
          val d = new java.util.HashMap[Long, Long]()
          dit.foreach { case (n, c) => d.put(n, d.getOrDefault(n, 0L) + c) }
          ait.map { case (n, dg) => (n, dg - d.getOrDefault(n, 0L)) }
      }.persist(MemDisk)
      // Same one-persist discipline as init: the round's live/dead
      // splits are narrow filters over the persisted merge result; the
      // one pending count materializes it.
      val nextRemoved = next.filter(_._2 < k)
      pending = nextRemoved.count() // materializes; terminates; guards
      retired += table
      table = next
      alive = next.filter(_._2 >= k)
      removed = nextRemoved
      rounds += 1
    }
    require(pending == 0,
      s"kCoreRdd: peel did not converge within $maxRounds rounds " +
        s"($pending nodes still peeling) — at this scale use a bucketed " +
        "multi-level peel (ECL-style k-core)")
    // Release superseded round state only now: `alive` is a lazy
    // filter over the LAST persisted `next`, which stays cached for
    // the consumer (CacheScope releases it with the pipeline arena).
    retired.foreach(_.unpersist(false))
    alive
  }
}
