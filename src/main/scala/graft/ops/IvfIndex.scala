package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{native => gn}

/** IVF-style ANN (SURVEY §2.10 [N]) — the second scale path for
  * similarity search next to sign-LSH ([[Sketches.annPairs]]):
  * deterministic coarse quantizer (k centroids), every vector assigned to
  * its `nProbe` nearest cells, candidate pairs only within a shared cell.
  *
  * Scale design: centroids are tiny → broadcast; assignment is one
  * narrow pass over the vectors (k cosine evals each, native kernel);
  * the pair join shuffles on `cid` (bounded cells, no all-pairs).
  * Deterministic: centroids are the k lowest-vec_id vectors (a fixed,
  * reproducible seeding — a Lloyd refinement pass would keep determinism
  * by averaging per cell; omitted since candidate quality, not cluster
  * quality, is what ANN needs here).
  */
object IvfIndex {

  /** (vec_id, cid, probe_rank) — each vector in its nProbe nearest cells. */
  def assign(embs: DataFrame, k: Int = 16, nProbe: Int = 2): DataFrame = {
    val centroids = embs.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val byDist = Window.partitionBy("vec_id")
      .orderBy(col("csim").desc, col("cid"))
    // keyed repartition: spreads a single input file without the
    // round-robin full shuffle of a bare repartition().
    graft.Q.spreadBy(embs, "vec_id").crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cid"),
        gn.cosine_similarity(col("embedding"), col("cvec")).as("csim"))
      .withColumn("probe_rank", row_number().over(byDist))
      .filter(col("probe_rank") <= nProbe)
      .select("vec_id", "cid", "probe_rank")
  }

  /** Candidate pairs sharing at least one probed cell, with exact cosine.
    * `broadcastReattach = false` switches the embedding re-attach to
    * shuffle-merge keyed joins (the 100 TB path — see
    * [[Sketches.reattachCosine]]).
    */
  def annPairs(embs: DataFrame, k: Int = 16, nProbe: Int = 2,
      broadcastReattach: Boolean = true): DataFrame = {
    // Assignment (k cosine evals per vector + a window) feeds both sides
    // of the cell self-join — persist the skinny (vec_id, cid, probe_rank)
    // so it runs once.
    val a = assign(embs, k, nProbe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = a.select(col("vec_id").as("id1"), col("cid"))
    val r = a.select(col("vec_id").as("id2"), col("cid").as("cid2"))
    val cands = l.join(r, col("cid") === col("cid2") && col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    Sketches.reattachCosine(cands, embs, broadcastReattach)
  }
}
