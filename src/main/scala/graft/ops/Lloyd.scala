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

  /** One Lloyd pass: points (j?, vec_id, sv) + codebook cb (j?, cid,
    * cvec) → next codebook. `score(sv, cvec)` is ascending-better;
    * `fallback` supplies rows for cells that attracted no members.
    *
    * `subspaced = false` is the single-subspace (whole-vector) binding:
    * no `j` column exists ANYWHERE in the pass — the assignment join is
    * a plain broadcast cross join and every grouping drops the key.
    * This is not mere convenience: threading a constant `lit(0)` key
    * instead costs 3–5× per round (measured at sf0.1) — the folded
    * literal lands in grouping/partitioning expressions as `0 AS 0#n`,
    * defeating the aggregate codegen the j-free shape gets.
    */
  def step(points: DataFrame, cb: DataFrame,
      score: (Column, Column) => Column, fallback: DataFrame,
      subspaced: Boolean): DataFrame = {
    val j = if (subspaced) Seq(col("j")) else Nil
    val joined = if (subspaced) points.join(broadcast(cb), "j")
      else points.crossJoin(broadcast(cb))
    val members = joined
      .select((col("vec_id") +: j) :+
        struct(score(col("sv"), col("cvec")).as("d"),
          col("cid").as("cid"), col("sv").as("sv")).as("cand"): _*)
      .groupBy(col("vec_id") +: j: _*).agg(min(col("cand")).as("best"))
      .select(j :+ col("best.cid").as("cid") :+
        posexplode(col("best.sv")).as(Seq("pos", "v")): _*)
    val means = members.groupBy(j :+ col("cid") :+ col("pos"): _*)
      .agg(round((sum(col("v").cast(DecimalType(28, 12))) / count(lit(1)))
        .cast("double"), 6).as("m"))
      .groupBy(j :+ col("cid"): _*)
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))")
        .as("mvec"))
    // means is codebook-sized BY CONSTRUCTION (≤ one row per (j, cid))
    // — broadcast it explicitly: Catalyst's size estimate for it is
    // inflated by the upstream posexplode, so the fallback join would
    // otherwise plan as a sort-merge join with two full exchanges over
    // kilobytes of data.
    val keys = if (subspaced) Seq("j", "cid") else Seq("cid")
    fallback.join(broadcast(means), keys, "left")
      .select(keys.map(col) :+
        coalesce(col("mvec"), col("cvec")).as("cvec"): _*)
  }

  /** `rounds` Lloyd passes from `seed`. `fallbackToSeed` picks the
    * empty-cell source: the original seed (PQ) or the evolving codebook
    * (IVF).
    */
  def train(points: DataFrame, seed: DataFrame,
      score: (Column, Column) => Column, rounds: Int,
      fallbackToSeed: Boolean, subspaced: Boolean = true): DataFrame = {
    var cb = seed
    (0 until rounds).foreach { rnd =>
      cb = step(points, cb, score, if (fallbackToSeed) seed else cb, subspaced)
      if (rnd < rounds - 1) cb = graft.Q.cut(cb)
    }
    cb
  }
}
