package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-dup pair graph — the step a dedup
  * pipeline runs AFTER pair generation: pairs → clusters → keep one
  * representative document per cluster.
  *
  * Iterative min-label propagation with pointer jumping: every node
  * starts as its own representative; each round every node adopts the
  * smallest label among itself and its neighbors, then shortcuts to its
  * representative's representative (rep ← rep(rep), the classic pointer-
  * doubling move). Plain propagation alone needs O(component diameter)
  * rounds — a near-dup chain longer than the round budget would
  * hard-fail; the shortcut halves the remaining label-path length every
  * round, making convergence O(log diameter) (a 10⁶-long chain closes in
  * ~20 rounds). Each round is three shuffles (neighbor join + update
  * join + shortcut self-join).
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
      maxIter: Int = 50): DataFrame = {
    // Persist the symmetric edge list: it is re-joined EVERY round, and
    // edge generation is typically the expensive part (a near-dup pair
    // join) — without this it would recompute once per iteration.
    val sym = edges.select(col("id1").as("s"), col("id2").as("t"))
      .union(edges.select(col("id2").as("s"), col("id1").as("t")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Fuse round 1 into initialization: rep₀ = min(self, neighbors) —
    // one fewer convergence round for the common shallow graph.
    val firstNbr = sym.groupBy("s").agg(min("t").as("nmin"))
      .select(col("s").as("id"), col("nmin"))
    var labels = nodes.select(col("id")).join(firstNbr, Seq("id"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("nmin"), col("id"))).as("rep"))
      .localCheckpoint() // eager; truncates lineage (see scaladoc)
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
        .persist(StorageLevel.MEMORY_AND_DISK)
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
        .localCheckpoint(eager = false) // truncates the doubled self-join lineage
      // Min-propagation is monotone: converged when no label shrank.
      val changed = next.filter(col("rep") < col("prev")).count()
      prop.unpersist()
      labels = next.select("id", "rep")
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents: not converged after $maxIter rounds")
    labels
  }
}
