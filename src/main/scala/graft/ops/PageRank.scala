package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank power iteration in exact integer arithmetic — the library
  * form of the `graph_pagerank` query, parameterized by iteration count.
  *
  * Ranks live in 1e-12 units as BIGINT; each out-contribution is
  * `rank div outdeg` and the damping step is `(85·Σ) div 100` — floor
  * division is bit-identical across engines, so the iteration needs no
  * decimal/double division contract (decimal÷decimal scale rules diverge
  * between engines; integer truncation cannot). Dangling vertices
  * contribute nothing (simplified variant, identical on the oracle side).
  *
  * Scale shape per iteration: one join of the rank vector against the
  * static (src, dst, od) edge relation (both partitioned by vertex) +
  * one keyed agg — the canonical Pregel-as-SQL step.
  *
  * Lineage discipline (the [[Components]] recipe, adapted): PageRank's
  * plan grows LINEARLY per round (each round references the previous
  * rank vector once — unlike Components' pointer-jumping self-join,
  * which doubles the plan per round), so truncation every round would
  * only break Catalyst's exchange reuse across the fused segment and
  * slow the common shallow runs. Instead the lineage is cut with a lazy
  * `localCheckpoint` every `checkpointEvery` rounds: plan depth stays
  * bounded at one block regardless of iteration count, and a 3-round
  * run (the declared query) remains ONE fused job with the edge
  * relation's exchange computed once. Local checkpoints trade
  * lineage-based recovery for that bound; a production run on
  * preemptible executors would use a reliable `checkpoint()` instead.
  */
object PageRank {

  /** edges(src, dst) — directed, assumed deduplicated — → (vid, r) with
    * r the PageRank in 1e-12 units after `iterations` damped rounds.
    * Vertex set = src ∪ dst. Deterministic: pure integer arithmetic.
    */
  def run(edges: DataFrame, iterations: Int,
      checkpointEvery: Int = 8): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(checkpointEvery > 0, s"checkpointEvery must be > 0")
    val e = edges.select(col("src"), col("dst"))
    val v = e.select(col("src").as("vid")).union(e.select(col("dst").as("vid")))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    // (src, dst, od) is static across rounds and re-joined every round.
    // Within one fused segment Catalyst's exchange reuse dedups it; the
    // persist carries it ACROSS checkpoint barriers for deep runs.
    // Released by the caller's cache scope / LRU eviction.
    val ed = e.join(deg, "src")
      .transform(graft.Q.sketchPersist)
    val nv = v.agg(count(lit(1)).as("nv"))
    var r = v.join(broadcast(nv))
      .select(col("vid"), expr("1000000000000L div nv").as("r"))
    (1 to iterations).foreach { i =>
      val contrib = ed.join(r, col("src") === col("vid"))
        .select(col("dst"), expr("r div od").as("c"))
      r = v.join(contrib, col("vid") === col("dst"), "left")
        .groupBy("vid").agg(coalesce(sum("c"), lit(0L)).as("s"))
        .join(broadcast(nv))
        .select(col("vid"),
          expr("150000000000L div nv + (85 * s) div 100").as("r"))
      // Block boundary: cut the linearly-growing lineage every
      // `checkpointEvery` rounds (lazy — materializes with the next
      // action). Never after the final round: the consumer's one action
      // materializes that lineage anyway.
      if (i % checkpointEvery == 0 && i < iterations)
        r = graft.Q.cut(r, eager = false)
    }
    r
  }
}
