package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-dup pair graph — the step a dedup
  * pipeline runs AFTER pair generation: pairs → clusters → keep one
  * representative document per cluster.
  *
  * Two execution paths, picked by the MEASURED size of the edge list
  * (the symmetric relation is persisted and counted before branching —
  * one job that the iterative path paid anyway to materialize it):
  *
  * '''Small subgraph — single-task union-find.''' The near-dup subgraph
  * is usually a sliver of the corpus (only documents that collide in
  * some LSH band appear), so even at large corpus scale the edge list
  * often fits one task comfortably. Below `localSolveMaxEdges` edges the
  * whole solve is one `mapPartitions` over the coalesced persisted edge
  * blocks: union-by-min with path compression, so the root of every set
  * IS the component minimum — deterministic regardless of edge order.
  * This replaces per-round join/aggregate jobs (each a codegen compile +
  * AQE plan + shuffle) with one shuffle-free task; isolated nodes rejoin
  * via a broadcast left join. Memory bound: ≤ 2·maxEdges LongMap entries
  * in the solving task (~48 B/entry → ~100 MB at the default 2²⁰).
  *
  * '''Large subgraph — iterative min-label propagation with pointer
  * jumping.''' Every node starts as its own representative; each round
  * every node adopts the smallest label among itself and its neighbors,
  * then shortcuts to its representative's representative (rep ←
  * rep(rep), the classic pointer-doubling move). Plain propagation alone
  * needs O(component diameter) rounds — a near-dup chain longer than the
  * round budget would hard-fail; the shortcut halves the remaining
  * label-path length every round, making convergence O(log diameter) (a
  * 10⁶-long chain closes in ~20 rounds). Each round is three shuffles
  * (neighbor join + update join + shortcut self-join).
  *
  * Lineage is truncated every round with an eager `localCheckpoint`:
  * the shortcut self-join references the round's plan twice, so without
  * truncation the LOGICAL plan doubles per round — exponential analyzer
  * /explain cost long before any data moves (the label data itself is
  * tiny). Local checkpoints trade lineage-based recovery for that bound;
  * a production run on preemptible executors would use
  * `spark.sparkContext.setCheckpointDir` + `.checkpoint()` instead.
  */
object Components {

  /** nodes(id), edges(id1, id2) → (id, rep) with rep = min id reachable.
    * Deterministic (min label). Throws if not converged in `maxIter`.
    *
    * The RETURNED DataFrame is checkpoint-materialized — the converged
    * label table, cheap to fan multiple queries off; its blocks age out
    * via Spark's LRU block eviction.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50): DataFrame =
    connectedComponentsWithStats(nodes, edges, maxIter)._1

  /** Thrown INSIDE the solving task when the edge stream outgrows the
    * declared bound — the failover signal for the optimistic fast path.
    * Detected by message marker because Spark re-wraps task failures.
    */
  private val TooLargeMarker = "graft.Components.SUBGRAPH_TOO_LARGE"

  private def isTooLarge(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      if (c.getMessage != null && c.getMessage.contains(TooLargeMarker)) return true
      c = c.getCause
    }
    false
  }

  /** Edges-only variant: (id, rep) for every vertex INCIDENT TO ≥1 EDGE
    * — no separate node relation. This is the shape a dedup pipeline
    * wants (pair graph → labels; untouched documents are singletons by
    * construction and rejoin via one anti-join against these labels):
    * passing `nodes` = "distinct endpoints of edges" would pay a
    * union+distinct shuffle to compute a set the solve already knows,
    * plus the join attaching labels to it.
    *
    * The fast path is OPTIMISTIC: no pre-count job — the single-task
    * union-find runs as the FIRST materialization of the (persisted)
    * edge relation and enforces `localSolveMaxEdges` in-task, aborting
    * with a marker failure if the stream outgrows it; the driver then
    * falls over to the iterative path, which reuses whatever edge
    * blocks the aborted attempt already cached. Per-round job latency is
    * the real cost on a small subgraph, so skipping the gate job is
    * worth one wasted bounded attempt in the rare too-large regime
    * (pipelines that KNOW they're big pass `localSolveMaxEdges = 0`).
    * Retry cost of that abort on a real cluster: the marker failure is a
    * TASK failure, so Spark re-runs the solving task
    * `spark.task.maxFailures` (default 4) times — up to 4 bounded reads
    * of ≤ `localSolveMaxEdges` edges each — before the job fails and the
    * driver falls over. Acceptable for a rare regime (the reads are
    * cache-local after attempt 1); clustered pipelines near the bound
    * should pass `localSolveMaxEdges = 0` or gate on a driver-side count
    * instead.
    * Union-find is symmetric per edge, so the solve consumes each
    * undirected pair once — the 2× symmetric relation is never built
    * on this path.
    */
  def edgeComponents(edges: DataFrame, maxIter: Int = 50,
      localSolveMaxEdges: Long = 1L << 20): DataFrame = {
    val idType = edges.schema.head.dataType
    val integralIds = idType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val ed = edges.select(col("id1").as("s"), col("id2").as("t"))
      .transform(graft.Q.sketchPersist)
    if (integralIds && localSolveMaxEdges > 0) {
      try {
        val labels = localSolveEdgesOnly(ed, idType, localSolveMaxEdges)
        ed.unpersist()
        return labels
      } catch {
        case e: Throwable if isTooLarge(e) => () // fall through to iterative
        case e: Throwable =>
          ed.unpersist() // genuine failure: don't leak the cached blocks
          throw e
      }
    }
    val nodes = ed.select(col("s").as("id"))
      .union(ed.select(col("t").as("id"))).distinct()
    val (labels, _) = connectedComponentsWithStats(nodes,
      ed.select(col("s").as("id1"), col("t").as("id2")), maxIter,
      localSolveMaxEdges = 0)
    ed.unpersist()
    labels
  }

  /** [[connectedComponents]] plus the number of propagation rounds the
    * iterative path took (0 = single-task union-find path) — for
    * tooling/tests that assert round economy or pin a path.
    *
    * `localSolveMaxEdges` ≤ 0 disables the union-find fast path (used by
    * tests to exercise the iterative path on small fixtures).
    */
  def connectedComponentsWithStats(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 50, localSolveMaxEdges: Long = 1L << 20): (DataFrame, Int) = {
    // Persist the symmetric edge list: both paths read it more than once
    // (re-joined EVERY round / counted then solved), and edge generation
    // is typically the expensive part (a near-dup pair join) — without
    // this it would recompute per consumer.
    val sym = edges.select(col("id1").as("s"), col("id2").as("t"))
      .union(edges.select(col("id2").as("s"), col("id1").as("t")))
      .transform(graft.Q.sketchPersist)
    // Branch on the measured subgraph size. The count doubles as the
    // persist's materialization action — work the first round's join
    // would otherwise have absorbed, not an extra pass over the pairs.
    val idType = edges.schema.head.dataType
    val integralIds = idType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (integralIds && localSolveMaxEdges > 0
        && sym.count() <= 2 * localSolveMaxEdges) {
      val labels = localSolve(nodes, sym, idType)
      sym.unpersist()
      return (labels, 0)
    }
    // Fuse round 1 into initialization: rep₀ = min(self, neighbors) —
    // one fewer convergence round for the common shallow graph.
    val firstNbr = sym.groupBy("s").agg(min("t").as("nmin"))
      .select(col("s").as("id"), col("nmin"))
    var labels = nodes.select(col("id")).join(firstNbr, Seq("id"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("nmin"), col("id"))).as("rep"))
      .transform(graft.Q.cut(_)) // eager; truncates lineage (see scaladoc)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("t"), col("rep").as("nrep")), "t")
        .groupBy("s").agg(min("nrep").as("nmin"))
        .select(col("s").as("id"), col("nmin"))
      // Persisted because the shortcut below self-joins it — without the
      // persist each round would recompute the propagation join twice.
      // `prev` (the round's starting label) rides along so convergence
      // falls out of the same pass — no extra join against old labels.
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("rep").as("prev"),
          least(col("rep"), coalesce(col("nmin"), col("rep"))).as("rep"))
        .transform(graft.Q.sketchPersist)
      // Pointer jumping: adopt rep(rep). Labels are ≤ their node id and
      // monotonically shrinking, so this only ever tightens — it halves
      // the remaining path to the component minimum each round.
      // The checkpoint is LAZY: the convergence count below is the one
      // action per round — it materializes the checkpoint blocks AND
      // counts shrunk labels in the same job (the eager-checkpoint +
      // join-with-labels + count shape spent two jobs and one extra
      // shuffle per round; on a cluster each job is a driver round-trip).
      val next = prop
        .join(prop.select(col("id").as("rid"), col("rep").as("rrep")),
          col("rep") === col("rid"), "left")
        .select(col("id"), col("prev"),
          least(col("rep"), coalesce(col("rrep"), col("rep"))).as("rep"))
        .transform(graft.Q.cut(_, eager = false)) // truncates the doubled self-join lineage
      // Min-propagation is monotone: converged when no label shrank.
      val changed = next.filter(col("rep") < col("prev")).count()
      prop.unpersist()
      labels = next.select("id", "rep")
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents: not converged after $maxIter rounds")
    (labels, iter)
  }

  /** Single-task exact solve for a small edge list: union-by-min with
    * path compression over the coalesced persisted symmetric relation.
    * Attaching the larger root under the smaller keeps every set's root
    * equal to its minimum member, so the output (id → component min) is
    * deterministic whatever order the edges arrive in. The per-edge
    * labels are persisted and materialized BEFORE `sym` is released by
    * the caller (they are the only reader of its blocks); isolated nodes
    * rejoin via a broadcast left join, exactly mirroring the singleton
    * handling of the iterative path.
    */
  private def localSolve(nodes: DataFrame, sym: DataFrame,
      idType: DataType): DataFrame = {
    val uf = localSolveEdgesOnly(sym, idType, Long.MaxValue)
    nodes.select(col("id"))
      .join(broadcast(uf), Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("rep"))
  }

  /** The union-find solve itself: (id, rep) for every id appearing in
    * the (s, t) pair relation (symmetric or one-per-undirected-edge —
    * union-find doesn't care). Persisted AND materialized before
    * returning — the caller unpersists the input right after, and this
    * is the only reader of its blocks. One entry in `parent` per
    * non-root vertex; `seen` covers roots, so the output includes every
    * incident vertex including component minima. Rows beyond `maxEdges`
    * abort the task with [[TooLargeMarker]] — the stream is consumed
    * lazily, so an oversized input costs one bounded read, not a full
    * buffer.
    */
  private def localSolveEdgesOnly(pairs: DataFrame, idType: DataType,
      maxEdges: Long): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val marker = TooLargeMarker
    val uf = pairs
      .select(col("s").cast(LongType).as("_1"), col("t").cast(LongType).as("_2"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = new scala.collection.mutable.LongMap[Long]()
        val seen = new scala.collection.mutable.LongMap[Unit]()
        var n = 0L
        def find(x0: Long): Long = {
          var r = x0
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x0 // compress the walked path
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (s, t) =>
          n += 1
          if (n > maxEdges)
            throw new RuntimeException(s"$marker: edge stream exceeded $maxEdges")
          seen(s) = (); seen(t) = ()
          val rs = find(s); val rt = find(t)
          if (rs < rt) parent(rt) = rs
          else if (rt < rs) parent(rs) = rt
        }
        // Snapshot keys first: find() path-compresses (mutates) the map.
        // Iterate `seen`, not `parent`: roots (component minima) never
        // get a parent entry but still need an output row.
        val ks = seen.keysIterator.toArray
        ks.iterator.map(k => (k, find(k)))
      }
      .toDF("id", "rep")
      .select(col("id").cast(idType).as("id"), col("rep").cast(idType).as("rep"))
      .transform(graft.Q.sketchPersist)
    // Materialize before the caller unpersists the pair blocks; on ANY
    // failure (too-large marker or genuine) release the half-built cache
    // entry — otherwise a later equivalent plan would get the dead
    // InMemoryRelation substituted in (the edgeComponents leak, one
    // level deeper).
    try uf.count()
    catch { case e: Throwable => uf.unpersist(); throw e }
    uf
  }
}
