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
  * Unlike [[KCore]] (whose per-round count IS the termination test),
  * a fixed round count needs NO per-round action: the rounds chain
  * as stages of ONE job — no intermediate persist, no per-round job
  * scheduling — and round 1 skips the label table entirely (initial
  * labels are the node ids, so the first message is just the edge
  * source). Measured on the declared 3-round query at sf0.1: the
  * per-round-materialized form read 2.6 s, this single-job chain
  * ~1.2 s — the difference was job/persist overhead, not shuffle
  * bytes (3 × |E| message rows either way).
  *
  * The `maxEdges` admission guard bounds the actual cost driver
  * (per-round work is Θ(|E|)) and fails loudly at a scale where the
  * caller wants the semi-synchronous/colored-wave LPA family rather
  * than full synchronous rounds.
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
      maxEdges: Long = 200000000L): RDD[(Long, Long)] = {
    require(rounds >= 1, s"lpaRdd: rounds must be >= 1, got $rounds")
    val part = edges.partitioner.getOrElse(
      new org.apache.spark.HashPartitioner(edges.getNumPartitions))
    // The staged adjacency is persisted+counted at staging time, so
    // this is a cached-size read, not a scan.
    val nEdges = edges.count()
    require(nEdges <= maxEdges,
      s"lpaRdd: $nEdges directed edges exceeding the declared bound " +
        s"$maxEdges — per-round work is proportional to |E|; at this " +
        "scale use a semi-synchronous/colored-wave LPA, not full " +
        "synchronous rounds")
    var cur: RDD[(Long, Long)] = null
    (1 to rounds).foreach { r =>
      // Attach the SENDER's label partition-locally (labels and edge
      // source keys share `part`), emit it toward the target. Round 1
      // needs no label table at all: labels ARE the node ids.
      val msgs =
        if (r == 1) edges.map { case (u, (v, _)) => (v, u) }
        else edges.zipPartitions(cur, preservesPartitioning = false) {
          (eit, lit) =>
            val lm = new scala.collection.mutable.LongMap[Long]()
            lit.foreach { case (n, l) => lm(n) = l }
            // Every source holds a label (it received messages last
            // round — symmetric edges); the identity default is the
            // totality fallback, never taken on the staged graph.
            eit.map { case (u, (v, _)) => (v, lm.getOrElse(u, u)) }
        }
      // One combine shuffle: map-side fold into label→count maps.
      // (The two-primitive-shuffle alternative — ((v,label),1)
      // reduceByKey then a per-node argmax reduceByKey — measured
      // SLOWER on the declared query at sf0.1, 2.2 vs 1.8 s: the
      // second shuffle's scheduling+spill cost exceeds what the
      // cheaper tuple wire format saves. Negative result recorded,
      // map-combined form kept.)
      cur = msgs.combineByKey[scala.collection.mutable.LongMap[Long]](
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
    }
    // ONE action materializes the whole chain (each round's output has
    // exactly one consumer, so nothing recomputes); the final label
    // table stays persisted for the consumer (the CacheScope arena
    // releases it with the pipeline).
    val out = cur.persist(MemDisk)
    out.count()
    out
  }
}
