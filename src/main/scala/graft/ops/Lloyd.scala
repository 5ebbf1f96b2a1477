package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The ONE determinism-preserving Lloyd (k-means) recipe both ANN index
  * trainers run — [[IvfIndex.refineCentroids]] (1 subspace, cosine) and
  * [[PqIndex.trainCodebooks]] (m subspaces, L2²) are thin bindings of
  * this, so a determinism fix lands once.
  *
  * Relational shapes: points (j, vec_id, sv array<float>) — j is the
  * subspace id, a constant 0 for whole-vector clustering; codebooks
  * (j, cid, cvec array<float>). One pass = assignment + mean:
  *
  *  - '''Assignment''' is an arg-min AGGREGATION, not a window: min of
  *    struct(score, cid, sv) per (vec_id, j) picks the best-scoring
  *    centroid with map-side partial aggregation (ties break on cid —
  *    deterministic; sv is never reached since cid is unique within j).
  *    Codebooks are broadcast — kilobytes, never data-sized.
  *  - '''Mean''' is computed EXACTLY: members cast per-element to
  *    DECIMAL(28,12) (a deterministic rounding), summed in decimal —
  *    order-independent by construction — divided once, rounded to 6
  *    decimals, cast back to FLOAT. Bit-identical across partitionings
  *    and aggregation orders, no knife-edge float boundary.
  *  - '''Empty cells''' fall back per `fallback` (IVF: the previous
  *    round's centroid; PQ: the original seed — both preserved
  *    behaviors).
  *
  * Lineage: rounds that feed another round are localCheckpoint'd (the
  * next round references the codebook twice — broadcast + fallback);
  * the final round's single consumer materializes its lineage once
  * anyway, so checkpointing it would only add a job.
  */
object Lloyd {

  /** Ascending-better L2² score over two float vectors — the PQ metric.
    * Fixed left-to-right fold: deterministic per row.
    */
  def l2sq(sv: Column, cvec: Column): Column =
    aggregate(
      zip_with(sv, cvec, (x, y) => x.cast("double") - y.cast("double")),
      lit(0.0), (acc, v) => acc + v * v)

  /** One Lloyd pass: points (j, vec_id, sv) + codebook cb (j, cid, cvec)
    * → next codebook (j, cid, cvec). `score(sv, cvec)` is
    * ascending-better; `fallback` supplies (j, cid, cvec) for cells that
    * attracted no members.
    */
  def step(points: DataFrame, cb: DataFrame,
      score: (Column, Column) => Column, fallback: DataFrame): DataFrame = {
    val members = points
      .join(broadcast(cb), "j")
      .select(col("vec_id"), col("j"),
        struct(score(col("sv"), col("cvec")).as("d"),
          col("cid").as("cid"), col("sv").as("sv")).as("cand"))
      .groupBy("vec_id", "j").agg(min(col("cand")).as("best"))
      .select(col("j"), col("best.cid").as("cid"),
        posexplode(col("best.sv")).as(Seq("pos", "v")))
    val means = members.groupBy("j", "cid", "pos")
      .agg(round((sum(col("v").cast(DecimalType(28, 12))) / count(lit(1)))
        .cast("double"), 6).as("m"))
      .groupBy("j", "cid")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))")
        .as("mvec"))
    fallback.join(means, Seq("j", "cid"), "left")
      .select(col("j"), col("cid"), coalesce(col("mvec"), col("cvec")).as("cvec"))
  }

  /** `rounds` Lloyd passes from `seed`. `fallbackToSeed` picks the
    * empty-cell source: the original seed (PQ) or the evolving codebook
    * (IVF).
    */
  def train(points: DataFrame, seed: DataFrame,
      score: (Column, Column) => Column, rounds: Int,
      fallbackToSeed: Boolean): DataFrame = {
    var cb = seed
    (0 until rounds).foreach { rnd =>
      cb = step(points, cb, score, if (fallbackToSeed) seed else cb)
      if (rnd < rounds - 1) cb = cb.localCheckpoint()
    }
    cb
  }
}
