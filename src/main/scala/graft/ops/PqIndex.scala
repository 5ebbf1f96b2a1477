package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.graft.{native => gn}

/** Product-quantization ANN (the third similarity-search scale path next
  * to sign-LSH ([[Sketches.annPairs]]) and IVF ([[IvfIndex]])): vectors
  * are split into `m` subspaces, each subvector quantized to one of `k`
  * codebook entries, and search runs by Asymmetric Distance Computation —
  * the query precomputes an (subspace, code) → partial-L2 lookup table,
  * so scoring a candidate is `m` table lookups + adds, touching only the
  * m-byte codes, never the raw vectors.
  *
  * Scale story: at 100 TB the corpus-side state is the code table
  * (m small ints per vector — a 64-dim float vector compresses 32×),
  * codebooks and query LUTs are kilobytes → broadcast; the ADC score is
  * a partial-aggregatable SUM over an equi-join on (subspace, code).
  * The shortlist is [[graft.plans.TopKPerGroupPlan]] (bounded heap per
  * query, no global sort), and only shortlisted candidates are reranked
  * against real vectors.
  *
  * Determinism (same contract as IvfIndex's Lloyd): codebook means are
  * summed EXACTLY in DECIMAL(28,12) per (subspace, code, position) —
  * order-independent by construction; assignment argmin ties break on
  * code id; ADC contributions are rounded once to DECIMAL(18,9) so the
  * per-candidate sum is exact decimal arithmetic; the final rerank uses
  * the exact cosine kernel rounded to 4 decimals with an id tiebreak —
  * a total order both engines replay identically.
  */
object PqIndex {

  /** 8-dim L2 distance² between two float subvectors, as a SQL lambda
    * (codegen-friendly, no UDF). Inputs are exact floats; the fold is a
    * fixed left-to-right expression tree — deterministic per row.
    */
  private val l2sq =
    "aggregate(zip_with(%s, %s, (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))," +
      " 0D, (acc, v) -> acc + v * v)"

  /** (vec_id, j, sv): each vector exploded into its m subvectors. */
  private[graft] def subvecs(embs: DataFrame, m: Int): DataFrame = {
    val d = 64 // fixture embedding dim (FIXTURES.md); callers assert m | d
    val sub = d / m
    embs.select(col("vec_id"), explode(expr(
      s"transform(sequence(0, ${m - 1}), j -> struct(j AS j, slice(embedding, j * $sub + 1, $sub) AS sv))"))
      .as("x"))
      .select(col("vec_id"), col("x.j").as("j"), col("x.sv").as("sv"))
  }

  /** Codebooks (j, cid, cvec): seeded from the k lowest-vec_id vectors'
    * subvectors (deterministic), tightened by `rounds` Lloyd passes run
    * over ALL subspaces at once — one assignment join + one decimal mean
    * aggregation per round, keyed by (j, cid), not m separate jobs.
    */
  def trainCodebooks(embs: DataFrame, m: Int, k: Int,
      rounds: Int): DataFrame = {
    val seed = subvecs(embs.orderBy("vec_id").limit(k), m)
      .select(col("j"), col("vec_id").as("cid"), col("sv").as("cvec"))
    var cb = seed
    (0 until rounds).foreach { rnd =>
      val members = subvecs(graft.Q.spreadBy(embs, "vec_id"), m)
        .join(broadcast(cb), "j")
        .select(col("vec_id"), col("j"),
          struct(expr(l2sq.format("sv", "cvec")).as("d2"),
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
      cb = seed.join(means, Seq("j", "cid"), "left")
        .select(col("j"), col("cid"), coalesce(col("mvec"), col("cvec")).as("cvec"))
      if (rnd < rounds - 1) cb = cb.localCheckpoint()
    }
    cb
  }

  /** (vec_id, j, code): every subvector assigned to its nearest codebook
    * entry (L2 argmin, ties → lowest cid). The corpus-side index state.
    */
  def encode(embs: DataFrame, cb: DataFrame, m: Int): DataFrame =
    subvecs(embs, m)
      .join(broadcast(cb), "j")
      .select(col("vec_id"), col("j"),
        struct(expr(l2sq.format("sv", "cvec")).as("d2"),
          col("cid").as("cid")).as("cand"))
      .groupBy("vec_id", "j").agg(min(col("cand")).as("best"))
      .select(col("vec_id"), col("j"), col("best.cid").as("code"))

  /** ADC top-`topK` neighbors for the `nq` lowest-id vectors used as
    * queries: LUT join → exact-decimal ADC sum → top-`shortlist` per
    * query (bounded heap) → exact cosine rerank → top-`topK` by
    * (rounded sim DESC, id). Returns (q_id, nb_id, sim).
    */
  def search(embs: DataFrame, nq: Int = 8, m: Int = 8, k: Int = 16,
      rounds: Int = 1, shortlist: Int = 100, topK: Int = 10): DataFrame = {
    val cb = trainCodebooks(embs, m, k, rounds)
    val codes = encode(graft.Q.spreadBy(embs, "vec_id"), cb, m)
    val queries = embs.filter(col("vec_id") < nq)
    // query LUT: one row per (q, subspace, code) — nq·m·k rows, kilobytes
    val lut = subvecs(queries, m).select(col("vec_id").as("q_id"), col("j"), col("sv"))
      .join(broadcast(cb), "j")
      .select(col("q_id"), col("j"), col("cid").as("code"),
        expr(l2sq.format("sv", "cvec")).cast(DecimalType(18, 9)).as("contrib"))
    // ADC: m lookups + an exact-decimal sum per (query, candidate)
    val adc = codes.join(broadcast(lut), Seq("j", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum("contrib").as("approx_d2"))
    val short = gn.top_k_per_group(adc, Seq("q_id"),
      Seq(col("approx_d2").asc, col("vec_id").asc), shortlist)
    // exact rerank of the shortlist only
    val reranked = short
      .join(broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))), "q_id")
      .join(embs.select(col("vec_id"), col("embedding").as("xe")), "vec_id")
      .select(col("q_id"), col("vec_id").as("nb_id"),
        round(gn.cosine_similarity(col("qe"), col("xe")), 4)
          .cast(DecimalType(18, 4)).as("sim"))
    gn.top_k_per_group(reranked, Seq("q_id"),
      Seq(col("sim").desc, col("nb_id").asc), topK)
      .orderBy(col("q_id"), col("sim").desc, col("nb_id"))
  }
}
