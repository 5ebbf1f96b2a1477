package graft.ops

import org.apache.spark.rdd.RDD

/** Community detection by synchronous label propagation (Raghavan
  * et al. 2007, made deterministic): every node starts as its own
  * label; each round every node adopts the most frequent label among
  * its NEIGHBORS, ties broken by the smallest label — the one
  * tie-break that makes synchronous LPA a pure function of (graph,
  * rounds), so the result is engine-exact and oracle-checkable
  * (classic LPA randomizes tie-breaks and update order precisely to
  * escape bipartite oscillation; a FIXED round count makes the
  * oscillating trajectory itself deterministic, which is what a hash
  * gate needs — the declared query runs 3 rounds).
  *
  * Execution shape (the [[Bfs]]/[[KCore]] round discipline, r15):
  * rounds as RDD operations over the staged partitioner-pinned
  * adjacency — zero Catalyst work per round. Per round: one
  * partition-local label lookup (`zipPartitions` on the shared
  * partitioner — the label table rides the same hash partitioner as
  * the edge source endpoints, so attaching the sender's label moves
  * no edge), then ONE combine shuffle of (target, label) messages
  * whose map-side combiner folds them into per-node label→count maps
  * (bounded by each node's distinct neighbor-label count, never the
  * raw message list — the mode-of-neighbors analogue of a partial
  * aggregate). Per-round state is one (node, label) row per node.
  *
  * The `maxNodes` admission guard fails loudly at a scale where the
  * caller wants the semi-synchronous/async LPA family (label updates
  * in colored waves) rather than full synchronous rounds.
  */
object Lpa {

  private val MemDisk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** edges: (u → (v, w)) symmetric, distinct pairs, hash-partitioned
    * (the [[graft.queries.Extra23.stagedGraphRdd]] contract; weights
    * ignored — label frequency counts distinct neighbors because the
    * pair set is distinct). Returns (node, label) after exactly
    * `rounds` synchronous updates.
    */
  def lpaRdd(edges: RDD[(Long, (Long, Long))], rounds: Int,
      maxNodes: Long = 50000000L): RDD[(Long, Long)] = {
    require(rounds >= 1, s"lpaRdd: rounds must be >= 1, got $rounds")
    val part = edges.partitioner.getOrElse(
      new org.apache.spark.HashPartitioner(edges.getNumPartitions))
    // Node set = distinct source endpoints (symmetric edges cover all
    // nodes as senders); initial label = the node itself.
    var labels: RDD[(Long, Long)] = edges.mapValues(_ => 0L)
      .reduceByKey(part, (a, _) => a)
      .mapPartitions(_.map { case (n, _) => (n, n) },
        preservesPartitioning = true)
      .persist(MemDisk)
    val nNodes = labels.count()
    require(nNodes <= maxNodes,
      s"lpaRdd: $nNodes nodes exceeding the declared bound $maxNodes — " +
        "at this scale use a semi-synchronous/colored-wave LPA, not " +
        "full synchronous rounds")
    val retired = scala.collection.mutable.ArrayBuffer[RDD[_]]()
    (1 to rounds).foreach { _ =>
      // Attach the SENDER's label partition-locally (labels and edge
      // source keys share `part`), emit it toward the target.
      val msgs = edges.zipPartitions(labels, preservesPartitioning = false) {
        (eit, lit) =>
          val lm = new java.util.HashMap[Long, Long]()
          lit.foreach { case (n, l) => lm.put(n, l) }
          // Every edge source is in the label table by construction
          // (labels were derived from the same edge keys).
          eit.map { case (u, (v, _)) => (v, lm.get(u).longValue()) }
      }
      // One combine shuffle: map-side fold into label→count maps.
      val next = msgs.combineByKey[scala.collection.mutable.LongMap[Long]](
        (l: Long) => {
          val m = new scala.collection.mutable.LongMap[Long](); m(l) = 1L; m
        },
        (m: scala.collection.mutable.LongMap[Long], l: Long) => {
          m(l) = m.getOrElse(l, 0L) + 1L; m
        },
        (a: scala.collection.mutable.LongMap[Long],
            b: scala.collection.mutable.LongMap[Long]) => {
          b.foreach { case (k, c) => a(k) = a.getOrElse(k, 0L) + c }; a
        },
        part)
        .mapValues { m =>
          // Most frequent label, smallest on ties — deterministic
          // regardless of merge order (counting is commutative).
          var bl = Long.MaxValue; var bc = 0L
          m.foreach { case (l, c) =>
            if (c > bc || (c == bc && l < bl)) { bl = l; bc = c }
          }
          bl
        }
        .persist(MemDisk)
      next.count() // materialize; bounds lineage growth per round
      retired += labels
      labels = next
    }
    // The final label table stays persisted for the consumer (the
    // CacheScope arena releases it with the pipeline); superseded
    // rounds release now.
    retired.foreach(_.unpersist(false))
    labels
  }
}
