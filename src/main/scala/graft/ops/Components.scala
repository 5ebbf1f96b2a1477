package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-dup pair graph — the step a dedup
  * pipeline runs AFTER pair generation: pairs → clusters → keep one
  * representative document per cluster.
  *
  * Iterative min-label propagation: every node starts as its own
  * representative; each round every node adopts the smallest label among
  * itself and its neighbors. Converges in O(component diameter) rounds —
  * near-dup graphs are shallow (copies of a common source), so a handful
  * of joins. Each round is two shuffles (neighbor join + update join);
  * labels persist round-over-round so lineage doesn't re-grow. At
  * extreme diameters production would switch to star-contraction
  * (O(log n) rounds); the label-propagation form is the deterministic,
  * skew-free baseline.
  */
object Components {

  /** nodes(id), edges(id1, id2) → (id, rep) with rep = min id reachable.
    * Deterministic (min label). Throws if not converged in `maxIter`.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
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
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("t"), col("rep").as("nrep")), "t")
        .groupBy("s").agg(min("nrep").as("nmin"))
        .select(col("s").as("id"), col("nmin"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("nmin"), col("rep"))).as("rep"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // Min-propagation is monotone: converged when no label shrank.
      val changed = next
        .join(labels.select(col("id"), col("rep").as("prev")), "id")
        .filter(col("rep") < col("prev")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    require(converged, s"connectedComponents: not converged after $maxIter rounds")
    labels
  }
}
