package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.graft.{native => gn}

/** IVF-PQ composite ANN index — the production similarity-search shape
  * (the default FAISS large-corpus configuration, Jégou et al. 2011
  * "Product Quantization for Nearest Neighbor Search"): an IVF coarse
  * quantizer partitions the corpus into cells, and Product Quantization
  * encodes each vector's RESIDUAL (vector − cell centroid) as m small
  * codes. Search probes only `qp` cells per query and runs Asymmetric
  * Distance Computation against the codes of THOSE cells only — where
  * the flat [[PqIndex]] must ADC-scan the full code table, IVF-PQ's scan
  * cost is `(probed cells / total cells)` of the corpus. Residual
  * encoding is what makes the composite work: residuals concentrate
  * near 0, so a small shared codebook quantizes them far better than
  * raw vectors.
  *
  * Scale story (what changes at 100 TB): corpus state is m small ints
  * per replica — the same 16-32× compression as flat PQ; centroids and
  * codebooks stay kilobytes → broadcast; the ADC join keys on
  * (cid, j, code), so a query's work is proportional to the OCCUPANCY
  * OF ITS PROBED CELLS, not the corpus (kCells grows ~√N holding cell
  * size constant — the standard IVF sizing). Corpus replication
  * `rc` (each vector encoded into its rc nearest cells) buys recall the
  * same way it does in [[IvfIndex.annPairs]] — replicating CODES is
  * cheap where replicating raw vectors is not.
  *
  * Determinism (the PqIndex/Lloyd contract): centroid refinement is the
  * shared decimal-exact Lloyd pass; seed codebooks come from the k
  * lowest-vec_id primary residuals; every argmin ties on the id; ADC
  * contributions round once to DECIMAL(18,9) so per-candidate sums are
  * exact; the rerank uses the exact cosine kernel under the
  * (ROUND(sim,4) DESC, id) total order both engines replay.
  */
object IvfPq {

  /** (idCols..., j, sv): residual vectors exploded into m subvectors. */
  private def subvecsR(res: DataFrame, idCols: Seq[String], m: Int,
      sub: Int): DataFrame =
    res.select(idCols.map(col) :+ explode(expr(
      s"transform(sequence(0, ${m - 1}), j -> struct(j AS j, slice(resid, j * $sub + 1, $sub) AS sv))"))
      .as("x"): _*)
      .select(idCols.map(col) :+ col("x.j").as("j") :+ col("x.sv").as("sv"): _*)

  /** The INDEX half — what a production system builds once at ingest:
    * (cents, cb, codes). Centroids via the shared decimal-exact Lloyd
    * pass, residual codebooks seeded from the k lowest-vec_id primary
    * residuals, every corpus replica PQ-encoded per (vector, cell,
    * subspace). All three frames are small relative to the raw corpus
    * (codes are the m-small-ints compression; cents/cb are kilobytes).
    */
  def buildIndex(embs: DataFrame, kCells: Int, rc: Int, m: Int, k: Int,
      refine: Int): (DataFrame, DataFrame, DataFrame) = {
    val f = buildFrames(embs, PqIndex.embeddingDim(embs, m), kCells, rc, m,
      k, refine)
    (f.cents, f.cb, f.codes)
  }

  /** Index frames plus the internal persisted residual relation, so the
    * staged path can unpersist what it no longer needs once the index is
    * on disk.
    */
  private final case class IndexFrames(cents: DataFrame, cb: DataFrame,
      codes: DataFrame, resid: DataFrame)

  private def buildFrames(embs: DataFrame, d: Int, kCells: Int, rc: Int,
      m: Int, k: Int, refine: Int): IndexFrames = {
    val sub = d / m
    // Centroids feed assignment AND two residual joins — persist (lazy)
    // so the Lloyd lineage runs once; kilobytes either way.
    val cents = IvfIndex.centroids(embs, kCells, refine)
      .transform(graft.Q.sketchPersist)
    val asg = IvfIndex.assignTo(embs, cents, nProbe = rc)
    // Corpus residuals per (vector, cell): v - centroid(cell).
    val resid = asg.filter(col("probe_rank") <= rc)
      .join(embs.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(cents), "cid")
      .select(col("vec_id"), col("cid"), col("probe_rank"),
        zip_with(col("embedding"), col("cvec"), (x, y) => x - y).as("resid"))
      .transform(graft.Q.sketchPersist)
    // Shared residual codebooks (j, ccode, cbvec), seeded from the k
    // lowest-vec_id PRIMARY residuals — the PqIndex seeding discipline
    // applied to residual space (rounds = 0 on the fixtures, like
    // sim_ann_pq: the seeds ARE the codebook).
    val cb = subvecsR(
        resid.filter(col("probe_rank") === 1).orderBy("vec_id").limit(k),
        Seq("vec_id"), m, sub)
      .select(col("j"), col("vec_id").as("ccode"), col("sv").as("cbvec"))
    // Encode every replica: argmin codebook entry per (vector, cell,
    // subspace), ties on ccode.
    val codes = subvecsR(resid, Seq("vec_id", "cid"), m, sub)
      .join(broadcast(cb), "j")
      .select(col("vec_id"), col("cid"), col("j"),
        struct(Lloyd.l2sq(col("sv"), col("cbvec")).as("d2"),
          col("ccode").as("ccode")).as("cand"))
      .groupBy("vec_id", "cid", "j").agg(min(col("cand")).as("best"))
      .select(col("vec_id"), col("cid"), col("j"), col("best.ccode").as("code"))
    IndexFrames(cents, cb, codes, resid)
  }

  /** ADC top-`topK` neighbors for the `nq` lowest-id vectors: coarse
    * assign (corpus → `rc` nearest cells, queries probe `qp`), PQ-encode
    * residuals, per-cell ADC, best-cell min, bounded-heap shortlist,
    * exact cosine rerank. Returns (q_id, nb_id, sim).
    */
  def search(embs: DataFrame, nq: Int = 8, kCells: Int = 16, rc: Int = 2,
      qp: Int = 5, m: Int = 8, k: Int = 16, shortlist: Int = 100,
      topK: Int = 10, refine: Int = 1): DataFrame = {
    require(rc >= 1 && rc <= kCells && qp >= 1 && qp <= kCells,
      s"IvfPq: need 1 <= rc <= kCells and 1 <= qp <= kCells, " +
        s"got rc=$rc qp=$qp kCells=$kCells")
    val d = PqIndex.embeddingDim(embs, m) // one probe for the whole pipeline
    val f = buildFrames(embs, d, kCells, rc, m, k, refine)
    searchIndexD(embs, d, f.cents, f.cb, f.codes, nq, qp, m, shortlist, topK)
  }

  /** One staged index per JVM × tag × parameterization, searched many
    * times — the production amortization contract (an ANN index is
    * ingest-time state, not per-query work; FAISS et al. persist it for
    * exactly this reason), and the same pattern as the bucketed-layout
    * staging in queries/Extra10. First call builds + writes the three
    * index frames as parquet (pid-keyed path: no cross-process races;
    * deterministic content — same corpus + params ⇒ byte-identical
    * results, so a re-build would change nothing); every later call
    * reads them back and pays ONLY the probe/ADC/rerank side.
    */
  def searchStaged(embs: DataFrame, tag: String, nq: Int, kCells: Int,
      rc: Int, qp: Int, m: Int, k: Int, shortlist: Int, topK: Int,
      refine: Int): DataFrame = {
    require(rc >= 1 && rc <= kCells && qp >= 1 && qp <= kCells,
      s"IvfPq: need 1 <= rc <= kCells and 1 <= qp <= kCells, " +
        s"got rc=$rc qp=$qp kCells=$kCells")
    val spark = embs.sparkSession
    val safe = tag.replaceAll("[^A-Za-z0-9]", "_")
    val dir = graft.Q.jvmStageRoot("graft_ivfpq") + s"/" +
      s"${safe}_k${kCells}_rc${rc}_m${m}_cb${k}_r$refine"
    // The dimension probe is a (tiny) Spark job; memoized under the same
    // key as the staged state — the dir folds in the corpus fingerprint,
    // so a corpus refresh re-probes along with the rebuild (r12: the
    // warm path was paying this job plus three datasource re-resolutions
    // per call, ~0.5 s of the declared query's fixed cost).
    val d = graft.Q.sessionMemo(spark, "ivfpqDim|" + dir)(
      Integer.valueOf(PqIndex.embeddingDim(embs, m))).intValue()
    staged.computeIfAbsent(dir, { _ =>
      val f = buildFrames(embs, d, kCells, rc, m, k, refine)
      graft.Q.fileSized(f.cents).write.mode("overwrite").parquet(s"$dir/cents")
      graft.Q.fileSized(f.cb).write.mode("overwrite").parquet(s"$dir/cb")
      graft.Q.fileSized(f.codes).write.mode("overwrite").parquet(s"$dir/codes")
      // The index is on disk — the build-side caches would otherwise sit
      // in executor memory for the JVM lifetime with no further reader.
      f.cents.unpersist(false)
      f.resid.unpersist(false)
      java.lang.Boolean.TRUE
    })
    searchIndexD(embs, d,
      graft.Q.readStagedParquet(spark, s"$dir/cents"),
      graft.Q.readStagedParquet(spark, s"$dir/cb"),
      graft.Q.readStagedParquet(spark, s"$dir/codes"), nq, qp, m, shortlist, topK)
  }
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** The SEARCH half against a prebuilt (cents, cb, codes) index: the
    * nq lowest-id vectors as queries, their own qp-cell coarse
    * assignment (a crossJoin of nq rows against the broadcast centroid
    * table — never the corpus-wide assignment pass), per-probed-cell
    * residual LUT, ADC equi-join, bounded-heap shortlist, exact rerank.
    */
  def searchIndex(embs: DataFrame, cents: DataFrame, cb: DataFrame,
      codes: DataFrame, nq: Int, qp: Int, m: Int, shortlist: Int,
      topK: Int): DataFrame =
    searchIndexD(embs, PqIndex.embeddingDim(embs, m), cents, cb, codes,
      nq, qp, m, shortlist, topK)

  private def searchIndexD(embs: DataFrame, d: Int, cents: DataFrame,
      cb: DataFrame, codes: DataFrame, nq: Int, qp: Int, m: Int,
      shortlist: Int, topK: Int): DataFrame = {
    val sub = d / m
    // The nq lowest-id vectors as queries (the PqIndex selection).
    val queries = embs.orderBy("vec_id").limit(nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    // Query-side coarse assignment + residual, FOLDED (VERDICT r11 #6):
    // the r11 form ran assignTo (crossJoin → rank rollup → posexplode)
    // and then joined BACK to queries (for qe) and to cents (for cvec) —
    // two broadcast builds + two join stages whose only purpose was to
    // re-attach columns the crossJoin had already seen. Carrying qe and
    // cvec THROUGH the rank rollup (cvec rides inside the candidate
    // struct — kCells · d doubles per query row, single-digit KB)
    // removes both joins; the (negsim, cid) prefix of the struct is
    // unique per query, so the array_sort order — and therefore the
    // probed cell set — is unchanged (the cvec tail never decides).
    // first(qe) is order-insensitive: every row in a q_id group carries
    // the same query embedding. Per-probed-cell residual
    // (q − centroid(cell)) mirrors how that cell's corpus codes were
    // formed — the asymmetric-distance identity that makes per-cell ADC
    // meaningful; the LUT is nq · qp · m · k rows, kilobytes, broadcast.
    val qcells = queries.crossJoin(broadcast(cents))
      .select(col("q_id"), col("qe"),
        struct((-gn.cosine_similarity(col("qe"), col("cvec"))).as("negsim"),
          col("cid").as("cid"), col("cvec").as("cvec")).as("cand"))
      .groupBy("q_id")
      .agg(first(col("qe")).as("qe"),
        slice(array_sort(collect_list(col("cand"))), 1, qp).as("top"))
      .select(col("q_id"), col("qe"), explode(col("top")).as("c"))
      .select(col("q_id"), col("c.cid").as("cid"),
        zip_with(col("qe"), col("c.cvec"), (x, y) => x - y).as("resid"))
    val lut = subvecsR(qcells, Seq("q_id", "cid"), m, sub)
      .join(broadcast(cb), "j")
      .select(col("q_id"), col("cid"), col("j"), col("ccode").as("code"),
        Lloyd.l2sq(col("sv"), col("cbvec")).cast(DecimalType(18, 9)).as("contrib"))
    // ADC, probed cells only: the (cid, j, code) equi-join touches a
    // code row iff some query probed its cell. m lookups + an exact-
    // decimal sum per (query, candidate, cell); a vector reachable via
    // several probed cells keeps its best (minimum) cell estimate —
    // min over exact decimals, deterministic.
    val adc = codes.join(broadcast(lut), Seq("cid", "j", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      // Key BOTH rollup exchanges on q_id alone (r16, guide §2.4):
      // HashPartitioning(q_id) satisfies the (q_id, vec_id, cid) and
      // (q_id, vec_id) groupings by the subset rule and the shortlist
      // heap's ClusteredDistribution(q_id) — one exchange where the
      // bare groupBys paid two and the heap cut a third. No explicit
      // partition count, so AQE still coalesces it.
      // ADVICE r16 tradeoff, noted: keying the exchange above the
      // rollup moves PRE-aggregate rows (per-cell/per-replica
      // multiplied) through the shuffle instead of combined partials —
      // measured a win at fixture scale, but at a much higher
      // nprobe/replica fan-out shuffle volume could dominate; if it
      // does, revert to the bare two-exchange groupBy per pipeline.
      .repartition(col("q_id"))
      .groupBy("q_id", "vec_id", "cid").agg(sum("contrib").as("d2cell"))
      .groupBy("q_id", "vec_id").agg(min("d2cell").as("approx_d2"))
    val short = gn.top_k_per_group(adc, Seq("q_id"),
      Seq(col("approx_d2").asc, col("vec_id").asc), shortlist)
    // Exact rerank of the shortlist only.
    val reranked = short.join(broadcast(queries), "q_id")
      .join(embs.select(col("vec_id"), col("embedding").as("xe")), "vec_id")
      .select(col("q_id"), col("vec_id").as("nb_id"),
        round(gn.cosine_similarity(col("qe"), col("xe")), 4)
          .cast(DecimalType(18, 4)).as("sim"))
    gn.top_k_per_group(reranked, Seq("q_id"),
      Seq(col("sim").desc, col("nb_id").asc), topK)
      .orderBy(col("q_id"), col("sim").desc, col("nb_id"))
  }
}
