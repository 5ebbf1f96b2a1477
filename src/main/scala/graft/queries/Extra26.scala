package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 additions (VERDICT r15 task list + family completions):
  *
  *   - `table_snapshot` / `table_incremental` / `table_compaction`: the
  *     native snapshot / time-travel / OPTIMIZE table family over
  *     `ops/SnapshotTable` — the one operating model the board did not
  *     yet declare (VERDICT r15 #2); vacuum completes the lifecycle
  *     (LayoutSpec-pinned, destructive so never a declared query).
  *   - `eval_reliability`: the isotonic (PAVA) reliability curve that
  *     completes the calibration story next to ECE/Brier (r15 #6).
  *   - `eval_ndcg_exact`: integer-exact classifier-score NDCG@10 on the
  *     collapsed score domain (the retrieval-ranking `eval_ndcg` in
  *     Extra21 is its per-probe window sibling).
  *   - `graph_louvain1`: one synchronous Louvain local-move sweep over
  *     the staged LPA assignment (r15 #7).
  *
  * Determinism contracts as established: integer/decimal arithmetic,
  * total output orders, no rand(), no UDFs. The snapshot store derives
  * version v from `o_orderkey % 3 == v-1`, so DuckDB replays any
  * snapshot/diff over the ORIGINAL parquet with the same modulo filter —
  * the gate proves the manifest machinery is lossless (loses no rows,
  * leaks no uncommitted ones).
  */
object Extra26 {

  /** Isotonic reliability fit over a (cu, pos) frame — cu = confidence
    * in integer nano-units, pos ∈ {0,1} — on eval_calibration's 10
    * fixed-width bins. The fitted per-bin rate is the NON-DECREASING
    * sequence minimizing squared error to the observed rates, i.e. the
    * pool-adjacent-violators solution (Ayer 1955; Zadrozny–Elkan 2002
    * use exactly this as the classifier-calibration curve), computed by
    * its closed min-max form  f(i) = max_{j≤i} min_{k≥i} rate(j..k)
    * instead of the sequential pooling loop: PAVA's stack algorithm is
    * inherently serial, but the min-max form is a JOIN over the bin
    * domain — and the bin domain is ≤10 rows BY CONSTRUCTION, so every
    * window/join below runs on a collapsed constant-bounded relation
    * (the agg_spearman argument), regardless of corpus size. The ONE
    * corpus-sized pass is the map-side quantize + 10-group rollup.
    *
    * Exactness: range rates are compared as num/den fractions through
    * one correctly-rounded double division (identical bits on both
    * engines) with total (k / j) tie-breaks, so both engines select the
    * same realizing range even at double-equal ties; rational-equal
    * ties are harmless by construction (equal rationals floor-divide to
    * the same nano-units). A distinct-rational double-equal collision
    * would need agreeing 53-bit significands across ~10⁷-scale
    * numerators — not reachable by the fixture and pinned brutally in
    * Extra26Spec against an exact-BigInt PAVA reference.
    */
  private[graft] def reliabilityOf(e: DataFrame): DataFrame = {
    // The ≤10-row bin rollup feeds THREE consumers (the prefix sums,
    // the i-domain, the final attach) — without a lineage cut each
    // branch re-derives the corpus rollup (3 events scans in the
    // executed plan, measured). The lazy localCheckpoint is the
    // ts_trending recipe: one corpus scan, every branch reads the cut
    // 10-row state (ExistingRDD; pinned in PlanSpec).
    val b = e.groupBy(least(expr("cu div 100000000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum("pos").as("np"))
      .transform(graft.Q.cut(_, eager = false))
    // Prefix sums over the ≤10 present bins (collapsed bounded domain —
    // the single-partition exchange here moves ≤10 rows).
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = b.select(col("bin"), col("n"), col("np"),
      sum("n").over(w).as("sn"), sum("np").over(w).as("sp"))
    // All bin ranges [j, k]: pooled num/den via inclusive-prefix diffs.
    val pr = p.as("j").join(p.as("k"), col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("j"), col("k.bin").as("k"),
        (col("k.sp") - col("j.sp") + col("j.np")).as("num"),
        (col("k.sn") - col("j.sn") + col("j.n")).as("den"))
    val frac = col("num").cast("double") / col("den")
    // min over k ≥ i per (i, j), then max over j ≤ i per i.
    val t = b.select(col("bin").as("i"))
      .join(pr, col("j") <= col("i") && col("k") >= col("i"))
    val mn = t.withColumn("rn", row_number().over(
        Window.partitionBy("i", "j").orderBy(frac.asc, col("k").asc)))
      .filter(col("rn") === 1)
    val mx = mn.withColumn("rn2", row_number().over(
        Window.partitionBy("i").orderBy(frac.desc, col("j").asc)))
      .filter(col("rn2") === 1)
      .select(col("i").as("bin"),
        expr("(num * 1000000000) div den").as("fitted_units"))
    b.join(mx, "bin")
      .select(col("bin").cast("bigint").as("bin"), col("n"),
        col("np").as("n_pos"),
        expr("(np * 1000000000) div n").as("obs_units"),
        col("fitted_units"))
      .orderBy("bin")
  }

  /** One synchronous Louvain refinement sweep (Blondel 2008's local
    * move step, parallel form) over a labeling: each node inspects its
    * neighbor communities and takes the move with maximal ΔQ if that
    * maximum is positive; all moves apply together, and the output is
    * the REMEASURED modularity of the new labeling next to the old —
    * the honest gate for a synchronous sweep, whose pointwise ΔQ
    * predictions need not compose additively (two adjacent nodes can
    * both move; sequential Louvain re-scores after every move).
    *
    * ΔQ in exact integers (the modularityOf discipline — division
    * factored out): with m2 = |directed edges|, k_i = deg(i), k_{i,c}
    * = i's neighbors in c, D_c = community degree sums,
    *   ΔQ·m2²/2 = (k_{i,b} − k_{i,a})·m2 − k_i·(D_b − D_a + k_i)
    * for a move a→b — every operand BIGINT (bounds as modularityOf:
    * ≤ m2², ~2·10¹³ at sf0.1; DECIMAL(38) past ~10⁹ directed edges).
    * Ties break (ΔQ DESC, community ASC) — total, engine-identical.
    *
    * Scale shape: the per-node candidate relation is Σ_i |neighbor
    * communities of i| ≤ |E| rows — edge-bounded, shuffled on the node
    * key; the argmax is the bounded-heap top-1 cut (top_k_per_group),
    * never a global sort; community-degree relations are
    * community-count-sized broadcasts; label attaches follow the
    * modularityOf broadcast discipline and its node-count ceiling
    * (spark.graft.graph.broadcastLabels=false past driver capacity).
    */
  private[graft] def louvain1Of(e: DataFrame, lab: DataFrame,
      nodeBound: Option[Long] = None): DataFrame = {
    // Dataflow shaped for ONE edge-sized shuffle and a MINIMAL barrier
    // count (r16 optimization round; guide §1.2/§2.4). History: the
    // first form called modularityOf twice (~10 sequential jobs, three
    // 2m-row shuffles, 4.8 s warm at sf0.1); the mid-build rework cut
    // that to one edge shuffle but still carried SIX sequential
    // checkpoint barriers (elab, nc, dc, base, mv, l4) plus the final
    // assembly — and on this graph (1.2M directed edges) each barrier
    // is ~0.3-0.9 s of fixed stage/scheduling cost, not data
    // (LouvainProbe step timings: warm sum 5.4 s, bench 5.3-6.6 s).
    // The fix is structural: fold the per-node frame INTO the one
    // edge-sized rollup. Grouping by (node, own-label, neighbor-label)
    // — own-label is constant per node, so the key widens nothing —
    // makes nc2 the single corpus-grain relation from which degrees,
    // ka (own-community count), m2, intra_b, community degrees and the
    // candidate relation ALL derive as collapsed rollups: the second/
    // third edge passes (m2i, degl) and their barriers disappear.
    // Barriers kept (r17, VERDICT r16 #1 — down from r16's three):
    // nc2 (read ≥6 times) and mv (4 consumers), both EAGER — the lazy
    // form let concurrent broadcast jobs race to materialize the cut
    // and compute the edge-grain map twice (StageProbe: two 2.1 MB map
    // stages). degl/dc/base/l4 re-derive from the cut states inside
    // their consumers' plans — node-sized rollup/broadcast work the
    // final execution runs concurrently instead of sequentially; dc
    // derives DIRECTLY from nc2 (Σk grouped by the constant own label
    // ≡ the degl→dc chain) so the degl and dc broadcasts build in the
    // same wave. Dropping the mv barrier too was A/B-measured WORSE
    // (1.97 vs 1.79 warm min — four concurrent re-derivations of the
    // heap cut's node exchange; recorded negative result). Measured
    // r16→r17 same box: 3.06 → 1.79 s warm steady (QuickTime), bench
    // baseline 2.68 s. Node-sized broadcasts share labelSide's
    // documented node-count ceiling and its conf gate.
    val bcast: DataFrame => DataFrame =
      df => if (Extra24.broadcastLabels(df.sparkSession, nodeBound))
        broadcast(df) else df
    // THE edge-sized shuffle: per-(node, own-community, neighbor-
    // community) counts, labels attached map-side (broadcast).
    val nc2 = e.join(Extra24.labelSide(lab, "u", "lu", nodeBound), "u")
      .join(Extra24.labelSide(lab, "v", "lv", nodeBound), "v")
      .groupBy(col("u").as("node"), col("lu").as("a"), col("lv").as("nlab"))
      .agg(count(lit(1)).as("k"))
      .transform(graft.Q.cut(_))
    // m2 + before-intra: a 1-row rollup of nc2 (no edge rescan).
    val m2i = nc2.agg(sum("k").as("m2"),
      sum(when(col("a") === col("nlab"), col("k")).otherwise(0L)).as("intra_b"))
    // Node frame from nc2: own label (constant per node), degree
    // ki = Σk, own-community count ka = Σk[a = nlab]. max(a) ≡ the
    // constant own label — deterministic, order-free. NOT a barrier
    // (r17, VERDICT r16 #1): each consumer re-derives this node-sized
    // rollup from the CUT nc2 state inside its own plan — those
    // re-rollups run concurrently in the mv/final jobs, where the old
    // sequential localCheckpoint paid one full job of fixed stage cost
    // to save them (barrier count 3 → 2).
    def degl = nc2.groupBy("node")
      .agg(max(col("a")).as("a"), sum("k").as("ki"),
        sum(when(col("a") === col("nlab"), col("k")).otherwise(0L)).as("ka"))
    // Community degrees DIRECTLY from nc2 (r17): dc = Σ_node ki over a
    // ≡ Σ of ALL nc2 k rows grouped by the constant own label — one
    // rollup of the cut state instead of the degl→dc chain, so the dc
    // and degl broadcasts build CONCURRENTLY (one sequential wave
    // fewer; StageProbe timeline, OPTIMIZATION_r17.md).
    def dc = nc2.groupBy("a").agg(sum("k").as("dcv"))
    val sqB = dc.agg(sum(col("dcv") * col("dcv")).as("sq_b"))
    // Candidates: nc2 rows are already (node, a, nlab, k) — the own-
    // community filter needs no attach; ki/ka/da/db/m2 arrive as
    // node-/community-/1-row-sized broadcasts, so the edge-sized
    // relation is never key-shuffled for a join; the only exchange
    // left is the heap cut's clustering. da attaches by its own
    // broadcast join on the carried `a` column (r17 — the former
    // degl⋈dc `base` hop serialized the two rollups).
    val cand = nc2.filter(col("nlab") =!= col("a"))
      .join(bcast(degl.select(col("node"), col("ki"), col("ka"))), "node")
      .join(bcast(dc.select(col("a"), col("dcv").as("da"))), "a")
      .join(bcast(dc.select(col("a").as("nlab"), col("dcv").as("db"))), "nlab")
      .crossJoin(broadcast(m2i.select("m2")))
      .withColumn("delta", (col("k") - col("ka")) * col("m2")
        - col("ki") * (col("db") - col("da") + col("ki")))
    val gn = org.apache.spark.sql.graft.native
    val mv = gn.top_k_per_group(cand, Seq("node"),
        Seq(col("delta").desc, col("nlab").asc), 1)
      .select(col("node"), col("nlab").as("bl"), col("delta"))
      .transform(graft.Q.cut(_))
    val moves = mv.filter(col("delta") > 0)
      .agg(count(lit(1)).as("n_moved"),
        coalesce(sum("delta"), lit(0L)).as("gain_units"))
    // New labeling from the cut states alone (node-sized, no edge
    // touch); re-derived per consumer — broadcast-build work inside
    // the final plan, not a barrier.
    def l4 = degl.join(bcast(mv), Seq("node"), "left")
      .select(col("node"), col("ki"),
        when(col("delta") > 0, col("bl")).otherwise(col("a")).as("label"))
    // After-side remeasurement: intra_a needs EDGE grain with both
    // endpoints' NEW labels — nc2 collapsed the neighbor's identity
    // away (only its old community survives), so this is the one place
    // the raw edge relation is scanned a second time: two broadcast
    // relabel attaches + a 1-row rollup, map-side all the way, no
    // barrier (it runs inside the final assembly's plan).
    val relab = l4.select(col("node"), col("label"))
    val intraA = e
      .join(bcast(relab.select(col("node").as("u"), col("label").as("l4u"))), "u")
      .join(bcast(relab.select(col("node").as("v"), col("label").as("l4v"))), "v")
      .agg(sum(when(col("l4u") === col("l4v"), 1L).otherwise(0L))
        .as("intra_a"))
    val sqA = l4.groupBy("label").agg(sum("ki").as("dcv"))
      .agg(sum(col("dcv") * col("dcv")).as("sq_a"))
    // intraA is the assembly SPINE, not a broadcast (r17): it is the
    // longest dependency chain (mv → relab broadcast → edge rescan), so
    // broadcasting it added one more materialization hop after the
    // slowest branch; as the spine its 1-row aggregate flows straight
    // into the result stage while the cheap scalars broadcast in
    // parallel.
    intraA.crossJoin(broadcast(m2i)).crossJoin(broadcast(moves))
      .crossJoin(broadcast(sqB)).crossJoin(broadcast(sqA))
      .select(col("m2"), col("n_moved"), col("gain_units"),
        (col("intra_b") * col("m2") - col("sq_b")).as("q_num_before"),
        (col("intra_a") * col("m2") - col("sq_a")).as("q_num_after"),
        Q.dec6(round(
          (col("intra_a") * col("m2") - col("sq_a")).cast("double")
            / (col("m2") * col("m2")).cast("double"), 6)).as("q_after"))
  }

  /** Cumulative NDCG@10 rank weights in nano-units: cumW(r) =
    * Σ_{i=1..r} ⌊10⁹ / log₂(i+1)⌋, cumW(0) = 0 — FIXED integer
    * constants (the RRF-constant discipline: the only transcendental,
    * log₂, is baked into ten literals shared verbatim by both engines,
    * so the gate arithmetic is pure integers; Järvelin–Kekäläinen
    * discounted gain at binary relevance).
    */
  private[graft] val ndcgCumW: Array[Long] = Array(0L, 1000000000L,
    1630929753L, 2130929753L, 2561606311L, 2948459118L, 3304666305L,
    3637999638L, 3953464514L, 4254494509L, 4543559335L)

  /** The same constants as a DuckDB list literal — ONE Scala source for
    * both engines' weights, so they cannot drift.
    */
  private[graft] val ndcgCumWSql: String =
    ndcgCumW.mkString("[", ", ", "]")

  /** NDCG@10 over (seg, score, pos) rows with pessimistic ties, order-
    * free: on the collapsed (seg, score) domain (the agg_auc/recall@k
    * discipline — no per-row ranking ever), a tied group occupying
    * ranks [cumcnt+1, cumcnt+cnt] holds its np positives LAST, so its
    * DCG contribution telescopes to cumW(min(hi,10)) − cumW(min(lo−1,
    * 10)) — groups entirely below rank 10 contribute exactly 0. IDCG =
    * cumW(min(n_pos, 10)); the gate ratio is one trailing integer
    * division in nano-units (dcg ≤ cumW(10) ≈ 4.5·10⁹, ×10⁹ inside
    * int64).
    */
  private[graft] def ndcgOf(e: DataFrame): DataFrame = {
    val g = e.groupBy("seg", "score")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("np"))
    val w = Window.partitionBy("seg").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g.withColumn("cumcnt", coalesce(sum("cnt").over(w), lit(0L)))
    val cw = typedLit(ndcgCumW.toSeq)
    def cumW(x: org.apache.spark.sql.Column) =
      element_at(cw, least(x, lit(10L)).cast("int") + 1)
    val contrib = cumW(col("cumcnt") + col("cnt")) -
      cumW(col("cumcnt") + col("cnt") - col("np"))
    r.groupBy("seg")
      .agg(sum("cnt").as("n"), sum("np").as("n_pos"),
        sum(contrib).as("dcg_units"))
      .withColumn("idcg_units", cumW(col("n_pos")))
      .select(col("seg").cast("bigint").as("seg"), col("n"), col("n_pos"),
        col("dcg_units"), col("idcg_units"),
        coalesce(expr("(dcg_units * 1000000000) div nullif(idcg_units, 0)"),
          lit(0L)).as("ndcg_units"))
      .orderBy("seg")
  }

  val defs: Map[String, Q] = Map(

    // TIME TRAVEL: read the staged versioned table AS OF version 2 (of
    // 3 committed) and roll it up. The Spark side resolves manifest v2
    // — one driver-side read of a small file list, no data-dir listing
    // — and scans exactly those files; v3's files exist in the same
    // data directory and MUST stay invisible (that invisibility is the
    // whole point of manifest-based snapshots; LayoutSpec pins it with
    // an orphan-file probe). Oracle: v1∪v2 = keys ≡ 0,1 (mod 3).
    "table_snapshot" -> Q(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WHERE o_orderkey % 3 IN (0, 1)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val root = graft.ops.SnapshotTable.stage(s, d)
      graft.ops.SnapshotTable.readSnapshot(s, root, 2)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Q.dec2(sum(Q.dec2(col("o_totalprice")))).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    // INCREMENTAL REPROCESSING: exactly the rows ADDED between v1 and
    // v3 — the manifest set-diff (v2's and v3's ingest files), scanned
    // directly. This is the primitive a periodic 100 TB pipeline runs
    // every cycle ("process what arrived since my last checkpoint"):
    // cost scales with the NEW data, not the table — no anti-join
    // against the old snapshot, no full rescan. key_sum makes the gate
    // sensitive to any leaked v1 row or dropped v2/v3 row, not just
    // miscounts. Oracle: keys ≡ 1,2 (mod 3).
    "table_incremental" -> Q(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WHERE o_orderkey % 3 IN (1, 2)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val root = graft.ops.SnapshotTable.stage(s, d)
      graft.ops.SnapshotTable.readIncremental(s, root, 1, 3)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
        .orderBy("o_orderpriority")
    },

    // COMPACTION GATE: version 4 is the OPTIMIZE/rewrite commit — v3's
    // three-commit file layout rewritten into one sorted file and
    // swapped in by manifest commit (ops/SnapshotTable.compact). The
    // query aggregates the POST-compaction snapshot; the oracle is the
    // ORIGINAL table unfiltered — the gate proves the rewrite changed
    // the layout and nothing else (no lost/duplicated/mutated row).
    // LayoutSpec pins the rest of the lifecycle: old versions stay
    // readable until vacuum, the rewrite is dataChange=false to
    // incremental readers, vacuum reclaims exactly the unreferenced
    // files.
    "table_compaction" -> Q(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val root = graft.ops.SnapshotTable.stage(s, d)
      graft.ops.SnapshotTable.readSnapshot(s, root,
          graft.ops.SnapshotTable.CompactedVersion)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"),
          Q.dec2(sum(Q.dec2(col("o_totalprice")))).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    // RELIABILITY DIAGRAM WITH ISOTONIC FIT — the calibration-curve
    // member of the eval family (ECE gives one number, Brier a proper
    // score; the reliability curve is what you LOOK at, and its
    // monotone PAVA fit is the Zadrozny–Elkan calibration map you then
    // apply to scores). Shares eval_calibration's fixture: confidence
    // = frac(value) quantized once to nano-units, outcome = purchase.
    // Emits per bin the observed rate and the isotonic fitted rate,
    // both in exact integer nano-units; the oracle states the same
    // min-max form over the same prefix sums.
    "eval_reliability" -> Q(
      """WITH e AS (
        |  SELECT CAST(FLOOR((value - FLOOR(value)) * 1000000000) AS BIGINT) AS cu,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |b AS (SELECT LEAST(cu // 100000000, 9) AS bin,
        |             CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(pos) AS BIGINT) AS np
        |      FROM e GROUP BY 1),
        |p AS (SELECT bin, n, np,
        |             SUM(n) OVER (ORDER BY bin) AS sn,
        |             SUM(np) OVER (ORDER BY bin) AS sp
        |      FROM b),
        |pr AS (SELECT j.bin AS j, k.bin AS k,
        |              k.sp - j.sp + j.np AS num, k.sn - j.sn + j.n AS den
        |       FROM p j JOIN p k ON j.bin <= k.bin),
        |t AS (SELECT i.bin AS i, pr.j, pr.k, pr.num, pr.den
        |      FROM b i JOIN pr ON pr.j <= i.bin AND pr.k >= i.bin),
        |mn AS (SELECT i, j, num, den,
        |         ROW_NUMBER() OVER (PARTITION BY i, j
        |           ORDER BY CAST(num AS DOUBLE)/den ASC, k ASC) AS rn
        |       FROM t),
        |mx AS (SELECT i, num, den,
        |         ROW_NUMBER() OVER (PARTITION BY i
        |           ORDER BY CAST(num AS DOUBLE)/den DESC, j ASC) AS rn2
        |       FROM mn WHERE rn = 1)
        |SELECT CAST(b.bin AS BIGINT) AS bin, b.n, b.np AS n_pos,
        |  CAST((b.np * 1000000000) // b.n AS BIGINT) AS obs_units,
        |  CAST((mx.num * 1000000000) // mx.den AS BIGINT) AS fitted_units
        |FROM b JOIN mx ON b.bin = mx.i WHERE mx.rn2 = 1
        |ORDER BY bin""".stripMargin) { (s, d) =>
      reliabilityOf(T.events(s, d).select(
        floor((col("value") - floor(col("value"))) * lit(1000000000.0))
          .cast("bigint").as("cu"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos")))
    },

    // NDCG@10 — the graded-order member that completes the ranking-
    // eval family (MRR grades the first hit, recall@k the coverage,
    // AP the precision profile; NDCG grades the whole order with
    // log-discounted gain). Shares the (seg, score, pos) fixture and
    // the pessimistic-tie collapsed-domain discipline; the log₂
    // discounts are ten fixed integer literals (ndcgCumW) identical
    // in both engines, so the gate is pure integer arithmetic
    // end-to-end. DuckDB lists are 1-indexed; Spark element_at is
    // 1-indexed on arrays — both index cumW[x+1] for prefix x.
    "eval_ndcg_exact" -> Q(
      s"""WITH e AS (SELECT user_id % 4 AS seg, value AS score,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |g AS (SELECT seg, score, count(*) AS cnt, sum(pos) AS np
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT seg, cnt, np,
        |    coalesce(sum(cnt) OVER (PARTITION BY seg ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumcnt
        |  FROM g),
        |d AS (SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n,
        |        CAST(SUM(np) AS BIGINT) AS n_pos,
        |        CAST(SUM(${ndcgCumWSql}[CAST(LEAST(cumcnt + cnt, 10) + 1 AS BIGINT)]
        |          - ${ndcgCumWSql}[CAST(LEAST(cumcnt + cnt - np, 10) + 1 AS BIGINT)])
        |          AS BIGINT) AS dcg_units
        |      FROM r GROUP BY 1)
        |SELECT CAST(seg AS BIGINT) AS seg, n, n_pos, dcg_units,
        |  CAST(${ndcgCumWSql}[CAST(LEAST(n_pos, 10) + 1 AS BIGINT)] AS BIGINT) AS idcg_units,
        |  CAST(COALESCE((dcg_units * 1000000000)
        |    // NULLIF(${ndcgCumWSql}[CAST(LEAST(n_pos, 10) + 1 AS BIGINT)], 0), 0) AS BIGINT)
        |    AS ndcg_units
        |FROM d ORDER BY seg""".stripMargin) { (s, d) =>
      ndcgOf(T.events(s, d).select(
        (col("user_id") % 4).as("seg"), col("value").as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos")))
    },

    // LOUVAIN REFINEMENT STEP — one synchronous modularity-ascent
    // sweep over the staged LPA assignment (VERDICT r15 #7): LPA finds
    // communities by propagation, this step IMPROVES them by the
    // actual objective (each node takes its best-ΔQ neighbor
    // community; ΔQ in exact BIGINTs, see louvain1Of). The gate emits
    // the remeasured modularity numerator of the new labeling next to
    // the old — the oracle re-unrolls the three LPA rounds, replays
    // the move arithmetic, and reassembles both integers, so the gate
    // proves propagation + move selection + remeasurement end-to-end.
    "graph_louvain1" -> Q(
      """WITH e0 AS (SELECT DISTINCT l_orderkey * 2 AS a, l_partkey * 2 + 1 AS b
        |            FROM read_parquet('{sfDir}/lineitem.parquet')),
        |e AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0),
        |l0 AS (SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM e)),
        |c1 AS (SELECT e.v AS node, p.label, COUNT(*) AS cnt
        |       FROM e JOIN l0 p ON e.u = p.node GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (
        |        SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node
        |          ORDER BY cnt DESC, label) AS rn FROM c1) WHERE rn = 1),
        |c2 AS (SELECT e.v AS node, p.label, COUNT(*) AS cnt
        |       FROM e JOIN l1 p ON e.u = p.node GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (
        |        SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node
        |          ORDER BY cnt DESC, label) AS rn FROM c2) WHERE rn = 1),
        |c3 AS (SELECT e.v AS node, p.label, COUNT(*) AS cnt
        |       FROM e JOIN l2 p ON e.u = p.node GROUP BY 1, 2),
        |l3 AS (SELECT node, label FROM (
        |        SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node
        |          ORDER BY cnt DESC, label) AS rn FROM c3) WHERE rn = 1),
        |a2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM e),
        |dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS ki FROM e GROUP BY 1),
        |dc AS (SELECT x.label, CAST(SUM(ki) AS BIGINT) AS dc
        |       FROM dg JOIN l3 x ON dg.u = x.node GROUP BY 1),
        |nc AS (SELECT e.u AS node, y.label AS nlab, CAST(COUNT(*) AS BIGINT) AS k
        |       FROM e JOIN l3 y ON e.v = y.node GROUP BY 1, 2),
        |base AS (SELECT x.node, x.label AS a, dg.ki, dca.dc AS da,
        |                COALESCE(ka.k, 0) AS ka
        |         FROM l3 x JOIN dg ON dg.u = x.node
        |         JOIN dc dca ON dca.label = x.label
        |         LEFT JOIN nc ka ON ka.node = x.node AND ka.nlab = x.label),
        |cand AS (SELECT b.node, b.a, nc.nlab AS bl,
        |           (nc.k - b.ka) * a2.m2 - b.ki * (dcb.dc - b.da + b.ki) AS delta
        |         FROM base b JOIN nc ON nc.node = b.node AND nc.nlab <> b.a
        |         JOIN dc dcb ON dcb.label = nc.nlab, a2),
        |mv AS (SELECT node, bl, delta FROM (
        |        SELECT node, bl, delta, ROW_NUMBER() OVER (PARTITION BY node
        |          ORDER BY delta DESC, bl) AS rn FROM cand) WHERE rn = 1),
        |mvd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_moved,
        |               CAST(COALESCE(SUM(delta), 0) AS BIGINT) AS gain_units
        |        FROM mv WHERE delta > 0),
        |l4 AS (SELECT b.node,
        |         CASE WHEN mv.delta > 0 THEN mv.bl ELSE b.a END AS label
        |       FROM base b LEFT JOIN mv ON mv.node = b.node),
        |ib AS (SELECT CAST(COUNT(*) AS BIGINT) AS intra
        |       FROM e JOIN l3 x ON e.u = x.node JOIN l3 y ON e.v = y.node
        |       WHERE x.label = y.label),
        |sqb AS (SELECT CAST(SUM(dc * dc) AS BIGINT) AS s FROM dc),
        |dc4 AS (SELECT x.label, CAST(SUM(ki) AS BIGINT) AS dc
        |        FROM dg JOIN l4 x ON dg.u = x.node GROUP BY 1),
        |ia AS (SELECT CAST(COUNT(*) AS BIGINT) AS intra
        |       FROM e JOIN l4 x ON e.u = x.node JOIN l4 y ON e.v = y.node
        |       WHERE x.label = y.label),
        |sqa AS (SELECT CAST(SUM(dc * dc) AS BIGINT) AS s FROM dc4)
        |SELECT a2.m2, mvd.n_moved, mvd.gain_units,
        |  CAST(ib.intra * a2.m2 - sqb.s AS BIGINT) AS q_num_before,
        |  CAST(ia.intra * a2.m2 - sqa.s AS BIGINT) AS q_num_after,
        |  CAST(ROUND(CAST(ia.intra * a2.m2 - sqa.s AS DOUBLE)
        |             / CAST(a2.m2 * a2.m2 AS DOUBLE), 6) AS DECIMAL(18,6)) AS q_after
        |FROM a2, mvd, ib, sqb, ia, sqa""".stripMargin) { (s, d) =>
      import s.implicits._
      val lab = Extra24.stagedLpaLabels(s, d).toDF("node", "label")
      val e = s.table(Extra23.stagedGraphEdges(s, d)).select("u", "v")
      louvain1Of(e, lab, Some(Extra24.stagedNodeCount(s, d)))
    }
  )
}
