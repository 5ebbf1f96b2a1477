package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 session-2 additions: link prediction (the graph family's
  * recommendation member), recall/precision@k (the eval family's
  * set-retrieval member), Dice-scored collocations (the text family's
  * association-strength member beside raw-count text_ngram_freq), and
  * CUSUM changepoint localization (the ts family's drift member beside
  * the pointwise outlier detectors). Determinism contracts as
  * established: every gate column is an exact integer (nano-unit
  * scores via integer division, money in cents), every emitted set
  * carries a total order, and each metric is factored so a spec can
  * pin it against a brute sequential reference on hand fixtures.
  */
object Extra25 {

  /** Resource-allocation link-prediction scores (Zhou/Lü/Zhang 2009)
    * over a bipartite (item, basket) relation, for query items
    * selected by `px % queryMod == 1`: for same-side items x, y,
    * RA(x,y) = Σ_{shared baskets o} 1/deg(o), in nano-units via
    * integer division (10⁹ div deg — exact in both engines), plus the
    * common-neighbor count cn. Join-free basket form (the agg_cooccur
    * discipline): ONE fact shuffle builds per-basket sorted distinct
    * item sets, the query filter and pair fan-out run map-side inside
    * each ≤basket-sized set (only query-adjacent baskets emit
    * anything), and the RA weight is 10⁹ div size(basket) — the
    * degree is the set size, so no degree join exists at all. The
    * alternative double self-join (query edges ⋈ edges ⋈ degrees)
    * shuffles the fact three times; this shape shuffles it once and
    * the skinny (px, py) pair rollup once. Work ∝ query-adjacent
    * basket pairs; the per-basket guard is the basket build itself
    * (baskets are order-bounded in the fixtures; a hot basket would
    * need the cooccur salting path, named in the scaladoc there).
    *
    * The basket build is PRE-FILTERED to query-adjacent baskets by a
    * broadcast semi-join on the distinct query-item basket ids (the
    * query side of a link-prediction call is selective by contract —
    * "predict for THESE items"): only ~|query-adjacent| basket rows
    * cross the build shuffle instead of the whole fact (measured
    * 1.45 → 0.9 s at sf0.1, and the ratio grows with corpus/query
    * skew). deg(o) stays exact — qualifying baskets keep ALL their
    * items. For a non-selective query set the semi-join degrades to a
    * near-full pass; drop the filter there (it is an optimization,
    * never semantics).
    */
  private[graft] def linkPredScores(e0: DataFrame, queryMod: Int): DataFrame = {
    val qo = e0.filter(col("p") % queryMod === 1).select("o").distinct()
    e0.join(broadcast(qo), Seq("o"), "left_semi")
      .groupBy("o")
      .agg(array_sort(collect_set(col("p"))).as("ps"))
      .select(explode(expr(s"filter(ps, x -> x % $queryMod = 1)")).as("px"),
        col("ps"))
      .select(col("px"),
        explode(expr("filter(ps, y -> y != px)")).as("py"),
        expr("1000000000 div size(ps)").as("w"))
      .groupBy("px", "py")
      .agg(count(lit(1)).as("cn"), sum("w").as("ra_units"))
  }

  /** Pessimistic-tie recall@k / precision@k over (seg, score, pos)
    * rows — the set-retrieval eval twin of mrrOf, factored for the
    * brute-reference spec pin. Per (seg, score) group with cumcnt rows
    * strictly above it, cnt rows and np positives: under pessimistic
    * resolution the group's tied negatives rank first, so its
    * positives occupy ranks cumcnt+(cnt−np)+1 … cumcnt+cnt and the
    * number inside the top k is clamp(k − cumcnt − (cnt − np), 0, np).
    * Summing the clamp over groups IS the positive count of the
    * pessimistic top-k — order-free, no per-row ranking. Scale shape:
    * one (seg, score) rollup, one window over the COLLAPSED score
    * domain (the agg_auc discipline), two small rollups.
    */
  private[graft] def recallAtK(e: DataFrame, k: Int): DataFrame = {
    val g = e.groupBy("seg", "score")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("np"))
    val w = Window.partitionBy("seg").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g.withColumn("cumcnt", coalesce(sum("cnt").over(w), lit(0L)))
    // One rollup: r already carries cnt/np/cumcnt per (seg, score)
    // group, so totals and hits fold together — no t⋈h join.
    r.groupBy("seg").agg(
        sum("cnt").as("n"), sum("np").as("n_pos"),
        sum(greatest(lit(0L), least(col("np"),
          lit(k.toLong) - col("cumcnt") - (col("cnt") - col("np"))))).as("hits"))
      .select(col("seg").cast("bigint").as("seg"), col("n"), col("n_pos"),
        col("hits"),
        coalesce(expr("(hits * 1000000000) div nullif(n_pos, 0)"), lit(0L))
          .as("recall_units"),
        expr(s"(hits * 1000000000) div $k").as("precision_units"))
      .orderBy("seg")
  }

  /** Dice-coefficient collocation scores (Smadja 1993's association
    * family; Dice = 2·f(xy)/(f(x)+f(y))) over adjacent-token bigrams:
    * dice_units = (2·c_xy·10⁹) div (c_x + c_y) — one integer division,
    * exact in both engines, bounded (2·c_xy·10⁹ ≤ 2·10¹⁵ at any
    * plausible corpus count). Distinct from text_ngram_freq's raw
    * counts: Dice surfaces PHRASES (tokens that co-occur far more than
    * their individual frequencies predict — the "new york" vs "of
    * the" separation every vocabulary/phrase-mining pass needs).
    * minCount floors c_xy so one-off juxtapositions of two rare words
    * can't saturate the score. Scale shape: two corpus-scan rollups
    * (bigrams, unigrams — both map-side partial), unigram counts
    * broadcast back onto the bigram table twice (the vocabulary is
    * the frequency-compressed relation, orders of magnitude smaller
    * than the corpus — the text_surprisal discipline), top-20 as
    * TakeOrderedAndProject.
    */
  private[graft] def diceCollocations(docs: DataFrame, minCount: Long): DataFrame = {
    val w = docs.select(split(col("text"), " ").as("ws"))
    val cxy = w.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "j -> struct(element_at(ws, j) as w1, element_at(ws, j + 1) as w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val cu = w.select(explode(col("ws")).as("wd"))
      .groupBy("wd").agg(count(lit(1)).as("c"))
    cxy
      .join(broadcast(cu.select(col("wd"), col("c").as("c1"))),
        col("w1") === col("wd")).drop("wd")
      .join(broadcast(cu.select(col("wd"), col("c").as("c2"))),
        col("w2") === col("wd")).drop("wd")
      .select(col("w1"), col("w2"), col("c_xy"), col("c1"), col("c2"),
        expr("(2 * c_xy * 1000000000) div (c1 + c2)").as("dice_units"))
  }

  /** CUSUM changepoint localization over (event_type, cents, ts,
    * event_id) rows: per series ordered by (ts, event_id), the
    * centered cumulative sum C_i = n·prefix_i − i·total — the classic
    * CUSUM statistic with the mean division factored OUT (C_i =
    * n·(prefix_i − i·mean) — same argmax, pure BIGINT in cents), so
    * the changepoint index and peak are engine-exact integers. The
    * argmax tie resolves to the SMALLEST index inside ONE rollup:
    * max(struct(ac, −i)) picks the largest peak and, within a tied
    * peak, the largest −i = the smallest i — order-free, no
    * first/argmax, and the scored relation is consumed in a single
    * pass (the max-then-filter-then-min form re-derives the window a
    * second time for the index pass; this shape measured 1.8 → 0.9 s
    * at sf0.1). Scale shape: one window per series for (i, prefix) —
    * the per-series sort is the semantic floor of an exact
    * full-series CUSUM; at 100× series length the two-pass
    * distributed scan (per-partition subtotals broadcast as offsets)
    * replaces the single-partition window. The stats frame is
    * |series|-count-sized — broadcast, never a key shuffle.
    */
  private[graft] def cusumChangepoint(v: DataFrame): DataFrame = {
    val ord = Seq(col("ts"), col("event_id"))
    val w = Window.partitionBy("event_type").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = v.select(col("event_type"), col("cents"),
      row_number().over(
        Window.partitionBy("event_type").orderBy(ord: _*)).cast("bigint").as("i"),
      sum("cents").over(w).as("pre"))
    val s = v.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("tot"))
    val best = r.join(broadcast(s), "event_type")
      .select(col("event_type"),
        struct(abs(col("n") * col("pre") - col("i") * col("tot")).as("ac"),
          (-col("i")).as("ni")).as("cand"))
      .groupBy("event_type").agg(max("cand").as("best"))
    s.join(broadcast(best), "event_type")
      .select(col("event_type"), col("n"), col("tot").as("tot_cents"),
        (-col("best.ni")).as("k"), col("best.ac").as("cusum_units"))
      .orderBy("event_type")
  }

  /** Cohen's kappa over paired ratings (r1, r2) with BOTH divisions
    * factored out of the gate (the modularityOf discipline): with n
    * rows, so = observed agreements and Σrc = Σ_c rowmarginal_c ·
    * colmarginal_c, κ = (p_o − p_e)/(1 − p_e) = (n·so − Σrc)/(n² −
    * Σrc) — numerator and denominator exact BIGINTs (n² ≈ 2.5·10⁹ at
    * sf0.1; past ~3·10⁹ rows promote to DECIMAL(38)), one trailing
    * double division rounded identically in both engines. Scale
    * shape: one corpus-scan rollup per marginal + the 1-row n/so
    * frames, everything re-attached by broadcast — the corpus is
    * scanned twice and never key-shuffled.
    */
  /** Cohen's κ assembly over (r1, r2) rating pairs — both divisions
    * factored out so the gate columns are exact integers. Degenerate
    * contract (ADVICE r15): kappa_den = n² − Σ rc·cc is ZERO exactly
    * when both raters put all mass in one cell (p_e = 1 — chance
    * agreement is total and chance correction is undefined); κ is then
    * emitted as an explicit NULL via nullif in BOTH engines, never as
    * a 0/0 NaN whose decimal cast diverges cross-engine (Spark NaN →
    * DECIMAL is null, DuckDB keeps NaN). Pinned in Extra25Spec.
    */
  private[graft] def kappaOf(r: DataFrame): DataFrame = {
    val n = r.agg(count(lit(1)).as("n"))
    val so = r.filter(col("r1") === col("r2")).agg(count(lit(1)).as("so"))
    val rm = r.groupBy(col("r1").as("c")).agg(count(lit(1)).as("rc"))
    val cm = r.groupBy(col("r2").as("c")).agg(count(lit(1)).as("cc"))
    val se = rm.join(broadcast(cm), "c")
      .agg(sum(col("rc") * col("cc")).as("sum_rc"))
    n.crossJoin(broadcast(so)).crossJoin(broadcast(se))
      .select(col("n"), col("so"), col("sum_rc"),
        (col("n") * col("so") - col("sum_rc")).as("kappa_num"),
        (col("n") * col("n") - col("sum_rc")).as("kappa_den"),
        Q.dec6(round(
          (col("n") * col("so") - col("sum_rc")).cast("double")
            / nullif((col("n") * col("n") - col("sum_rc")).cast("double"),
                lit(0.0)), 6))
          .as("kappa"))
  }

  /** Lag-1..maxLag autocorrelation per series from exact integer power
    * sums (the agg_corr discipline, lagged): ONE window per series
    * computes all maxLag leads in one sort/pass, a map-side stack
    * turns them into (lag, x, y) pairs, and each (series, lag) group
    * folds the six power sums as exact BIGINTs in cents — the only
    * double ops are the trailing Pearson division and sqrt (IEEE
    * correctly-rounded, identical in both engines; ROUND(,6) last).
    * The trailing combinations run in DECIMAL(38,0) inside pearson6
    * (r16 — matches the oracle's HUGEINT envelope to ~10³⁸; loud
    * decimal overflow under ANSI past that, never a silent wrap).
    * Scale shape: the per-series window sort is the semantic floor
    * (same note as cusumChangepoint); everything after the stack is
    * two-phase aggregation over |series|·maxLag groups.
    */
  private[graft] def autocorrOf(v: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"autocorrOf: maxLag $maxLag must be >= 1 " +
      "(stack() over zero lags is a malformed expression)")
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val leads = v.select(col("event_type") +: col("x") +:
      (1 to maxLag).map(l => lead("x", l).over(w).as(s"y$l")): _*)
    val stackArgs = (1 to maxLag).map(l => s"$l, y$l").mkString(", ")
    val p = leads
      .selectExpr("event_type", "x", s"stack($maxLag, $stackArgs) as (lag, y)")
      .filter(col("y").isNotNull)
    p.groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("event_type"), col("lag").cast("bigint").as("lag"),
        col("n_pairs"), col("sxy").as("sxy_cents2"),
        Q.pearson6(col("n_pairs"), col("sx"), col("sy"), col("sxx"),
          col("syy"), col("sxy")).as("r"))
      .orderBy("event_type", "lag")
  }

  /** Degree assortativity of a SYMMETRIC directed edge list (u, v) via
    * the symmetry-folded power sums (see the graph_assortativity
    * comment): one broadcast attach of deg onto v, one per-u rollup,
    * one 1-row assembly. Factored so the spec can pin the folding
    * against textbook graphs (P3 → r = −1; K3 → degenerate 0/0).
    */
  private[graft] def assortativityOf(e: DataFrame): DataFrame = {
    val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
    e.join(broadcast(deg.select(col("u").as("v"), col("deg").as("dv"))), "v")
      .groupBy("u")
      .agg(count(lit(1)).as("du"), sum("dv").as("snbr"))
      .agg(sum("du").as("n"), sum(col("du") * col("du")).as("sx"),
        sum(col("du") * col("du") * col("du")).as("sxx"),
        sum(col("du") * col("snbr")).as("sxy"))
      .select(col("n").as("n_edges"), col("sx").as("sum_deg"),
        col("sxy").as("sum_degprod"),
        (col("n") * col("sxy") - col("sx") * col("sx")).as("r_num"),
        Q.pearson6(col("n"), col("sx"), col("sx"), col("sxx"),
          col("sxx"), col("sxy")).as("r"))
  }

  /** Tie-corrected Spearman rank correlation over (a, b) rows,
    * entirely on the COLLAPSED JOINT domain: one corpus scan folds to
    * distinct (a, b) pairs with counts, and each variable's
    * average-tie doubled rank r2 = 2·cumcnt + cnt + 1 is a pair of
    * RANGE-frame windows over that tiny relation (strictly-less
    * row-count + peer row-count — RANGE, not ROWS, because ties of
    * the ORDER key must aggregate as one group regardless of row
    * order). No join back to the corpus exists at all; the power sums
    * weight each joint row by its count. This replaced a
    * rank-table-broadcast form that was plan-correct but 8 AQE stages
    * deep (3 corpus scans, 2 windows, 2 broadcast builds — 2.1 s of
    * stage scheduling at sf0.1; this form: one scan, ~4 stages,
    * 0.6 s). ρ is Pearson over the doubled ranks (the ×2 cancels);
    * the n·sxx-style combinations happen in DOUBLE on both engines
    * (n·sxx overflows int64 past ~50k rows at doubled-rank scale, and
    * the double path is engine-identical: exact casts of exact
    * integers, one rounded trailing expression). The joint domain of
    * two integer length measures stays window-sized at any corpus
    * scale; two genuinely high-cardinality variables would need the
    * per-variable collapsed form with shuffled rank joins.
    */
  private[graft] def spearmanOf(d: DataFrame): DataFrame = {
    val j0 = d.groupBy("a", "b").agg(count(lit(1)).as("cnt"))
    def r2(c: String) = {
      val less = Window.orderBy(col(c))
        .rangeBetween(Window.unboundedPreceding, -1)
      val peers = Window.orderBy(col(c))
        .rangeBetween(Window.currentRow, Window.currentRow)
      lit(2L) * coalesce(sum("cnt").over(less), lit(0L)) +
        sum("cnt").over(peers) + 1
    }
    j0.select(col("cnt"), r2("a").as("x"), r2("b").as("y"))
      .agg(sum("cnt").as("n"), sum(col("cnt") * col("x")).as("sx"),
        sum(col("cnt") * col("y")).as("sy"),
        sum(col("cnt") * col("x") * col("x")).as("sxx"),
        sum(col("cnt") * col("y") * col("y")).as("syy"),
        sum(col("cnt") * col("x") * col("y")).as("sxy"))
      .select(col("n"), col("sxy").as("sum_rankprod"),
        Q.pearson6Double(col("n"), col("sx"), col("sy"), col("sxx"),
          col("syy"), col("sxy")).as("rho"))
  }

  /** Gini coefficient of a non-negative integer column from its
    * collapsed value domain, with average-tie ranks and BOTH divisions
    * factored out of the gate: gini_num = Σ_v (2·cumcnt + cnt + 1)·v·
    * cnt − (n+1)·Σx and gini_den = n·Σx are exact BIGINTs (the
    * tie-corrected mean-difference form of G = 2Σiᵢxᵢ/(nΣx) −
    * (n+1)/n), one trailing rounded division. The global window runs
    * over distinct values only; the corpus is scanned once into the
    * value rollup and never re-sorted.
    */
  private[graft] def giniOf(d: DataFrame): DataFrame = {
    val w = Window.orderBy(col("x")).rowsBetween(Window.unboundedPreceding, -1)
    val r = d.groupBy("x").agg(count(lit(1)).as("cnt"))
      .select(col("x"), col("cnt"),
        coalesce(sum("cnt").over(w), lit(0L)).as("cumcnt"))
    r.agg(sum("cnt").as("n"), sum(col("x") * col("cnt")).as("sx"),
        sum((lit(2L) * col("cumcnt") + col("cnt") + 1) * col("x") * col("cnt"))
          .as("twoixsum"))
      .select(col("n"), col("sx").as("total"),
        (col("twoixsum") - (col("n") + 1) * col("sx")).as("gini_num"),
        (col("n") * col("sx")).as("gini_den"),
        Q.dec6(round(
          (col("twoixsum") - (col("n") + 1) * col("sx")).cast("double")
            / (col("n") * col("sx")).cast("double"), 6)).as("gini"))
  }

  /** Lag-0..maxLag cross-correlation over a (day, cx, cy) daily-count
    * relation: pairs (cx(d), cy(d+lag)) via a broadcast self-join of
    * the COLLAPSED calendar relation (|days| rows — the corpus never
    * joins anything), exact integer power sums, the trailing Pearson
    * double ops last (the ts_autocorr discipline across two series).
    * Days missing on either side drop from that lag's pairs — join
    * semantics, identical in both engines. Factored so the spec can
    * pin a hand-shifted series (a copy at lag 1 must read exactly
    * 1.000000 there).
    *
    * Shape: NO self-join. A self-join of the calendar against itself
    * re-derives the corpus rollup once per pruned column set (Spark
    * splits the (cx, cy) pivot into two corpus scans — measured
    * 1.5 s), and persisting the 30-row relation to share it thrashed
    * the plan cache across repeated constructions (measured 3-8 s).
    * Instead each day row FANS OUT map-side into both sides of every
    * lag pairing — the x side lands at key (lag, day + lag), the y
    * side at (lag, day) — and a max-combine per (lag, pairday)
    * reassembles the pair (each key holds at most one x and one y
    * struct). One corpus scan, two tiny keyed exchanges, zero joins.
    */
  private[graft] def crossCorrOf(c: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"crossCorrOf: maxLag $maxLag must be non-negative")
    val sides = (0 to maxLag).flatMap { l =>
      Seq(struct(lit(l.toLong).as("lag"), (col("day") + l).as("d"),
            col("cx").as("x"), lit(null).cast("bigint").as("y")),
          struct(lit(l.toLong).as("lag"), col("day").as("d"),
            lit(null).cast("bigint").as("x"), col("cy").as("y")))
    }
    c.select(explode(array(sides: _*)).as("s"))
      .select(col("s.lag").as("lag"), col("s.d").as("d"),
        col("s.x").as("x"), col("s.y").as("y"))
      .groupBy("lag", "d")
      // One-row-per-day caller contract, ENFORCED (ADVICE r15): the
      // max-combine pairing is correct only because each (lag, d) key
      // holds at most one x and one y struct; a calendar that ever
      // carried duplicate days would silently max-merge them. The
      // per-key non-null counts are already paid for by the rollup —
      // the guard rides the x VALUE itself (the eval_confusion
      // raise_error discipline, so pruning can't drop it) and names
      // the offending key.
      .agg(max("x").as("x0"), max("y").as("y0"),
        count("x").as("nx"), count("y").as("ny"))
      .select(col("lag"), col("d"),
        when(col("nx") > 1 || col("ny") > 1,
          raise_error(concat(lit("crossCorrOf: duplicate calendar day "),
            col("d").cast("string"), lit(" at lag "),
            col("lag").cast("string"),
            lit(" — the caller contract is one row per day")))
            .cast("bigint"))
          .otherwise(col("x0")).as("x"),
        col("y0").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("lag"), col("n_pairs"), col("sxy").as("sum_prod"),
        Q.pearson6(col("n_pairs"), col("sx"), col("sy"), col("sxx"),
          col("syy"), col("sxy")).as("r"))
      .orderBy("lag")
  }

  /** Rank-climb assembly over a (p, qa, qb) two-snapshot rollup: rank
    * each half's non-null subset by (q DESC, p) — filtering BEFORE the
    * window so nulls never enter a sort (no cross-engine null-ordering
    * dependence) — inner-join the rank tables (items present in both
    * snapshots only) and emit climb = r_early − r_late. Factored so
    * the spec can pin the ranking/join/drop semantics on a hand
    * fixture. Each rank is the two-phase range-partitioned
    * [[globalRank]] — no unpartitioned window ever touches the item
    * rollup, whose |parts| domain grows with the table.
    */
  private[graft] def rankClimbOf(halves: DataFrame,
      domainBound: Long = Long.MaxValue): DataFrame = {
    // BOTH halves rank in ONE shared pass (r16 bench iteration: the
    // per-half globalRank pair paid two range exchanges, two bucket
    // windows and two offset joins — 1.9 s vs the 0.94 s single-window
    // r15 form; tagging the sides and ranking them through one shared
    // pass recovers the stage count while keeping the
    // no-unpartitioned-window scale contract). The FORM of that pass
    // is scale-ADAPTIVE (r16 optimization round, the sign-LSH
    // footer-stats pattern): `domainBound` is a caller-supplied upper
    // bound on the item domain (ts_trending passes the part table's
    // footer row count — l_partkey is a part FK, so |items| ≤ |part|).
    // Below `spark.graft.rank.twoPhaseMinRows` (default 2²¹ ≈ 2M: a
    // 2M-row skinny in-task sort is ~0.5 s — the point where the
    // two-phase pass's fixed costs, one range-sampling job + one range
    // exchange + the offset rollup, stop being overhead and start
    // being the win) both sides rank through ONE side-partitioned
    // window — 2 single-side sort tasks, zero extra exchanges,
    // measured 0.29 s vs the two-phase 0.76 s warm at sf0.1's 20k-part
    // domain. At or above the bound, [[globalRank2]]'s range-
    // partitioned two-phase rank takes over — no single task ever
    // sorts the unbounded domain. The conf keeps the crossover a
    // deployment decision, not a code constant.
    val sides = halves.select(col("p"),
        expr("stack(2, 0L, qa, 1L, qb) as (side, q)"))
      .filter(col("q").isNotNull)
    val twoPhaseMin = halves.sparkSession.conf
      .get("spark.graft.rank.twoPhaseMinRows", "2097152").toLong
    val ranked =
      if (domainBound >= twoPhaseMin) globalRank2(sides)
      else sides.select(col("side"), col("p"),
        row_number().over(Window.partitionBy("side")
          .orderBy(col("q").desc, col("p"))).cast("bigint").as("rank"))
    ranked
      .groupBy("p")
      .agg(max(when(col("side") === 0, col("rank"))).as("r_early"),
        max(when(col("side") === 1, col("rank"))).as("r_late"))
      .filter(col("r_early").isNotNull && col("r_late").isNotNull)
      .select(col("p"), col("r_early"), col("r_late"),
        (col("r_early") - col("r_late")).as("climb"))
  }

  /** Per-side global ROW_NUMBER over (q DESC, p) WITHOUT an
    * unpartitioned window (VERDICT r15 #5) — the two-phase
    * range-partitioned rank, computed for BOTH tagged sides in one
    * shared pass: the item domain here is |parts|, which grows with
    * the table, so the single-sort `Window.orderBy` form funnels the
    * whole relation through ONE task at scale. Instead:
    *
    *   1. range-shuffle the rows on (side, rank key) into K buckets —
    *      the side tag LEADS, so each side's rows occupy a contiguous,
    *      side-ordered bucket run (RangePartitioning's contract; AQE
    *      may coalesce buckets but only ADJACENTLY, which preserves
    *      the bucket-id/key-order correspondence);
    *   2. rank locally inside each (side, bucket) — parallel, each
    *      task sorts ≤ |rows|/K;
    *   3. add each bucket's per-side offset = that side's rows in all
    *      lower buckets. The offsets relation is ≤ 2K rows — bounded
    *      by a config constant, not by data — so ITS running-sum
    *      window is the accepted collapsed-domain shape, and it rides
    *      a broadcast back onto the buckets.
    *
    * (p, q) rows are unique in p per side (a groupBy(p) rollup feeds
    * this), so the (q DESC, p) order is total per side and the result
    * is deterministic, bucket boundaries included.
    */
  private[graft] def globalRank2(rows: DataFrame,
      buckets: Int = 0): DataFrame = {
    // Bucket count follows the session's shuffle parallelism unless the
    // caller overrides — scale-adaptive (guide §2): a constant tuned
    // for one box would under-split on a cluster and over-split at
    // lower driver core counts.
    val k = if (buckets > 0) buckets
      else rows.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = rows
      .repartitionByRange(k, col("side"), col("q").desc, col("p"))
      .select(col("side"), col("p"), col("q"),
        spark_partition_id().as("bucket"))
    val offsets = parts.groupBy("side", "bucket")
      .agg(count(lit(1)).as("c"))
      .select(col("side"), col("bucket"),
        coalesce(sum("c").over(Window.partitionBy("side")
          .orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
    parts.join(broadcast(offsets), Seq("side", "bucket"))
      .select(col("side"), col("p"),
        (row_number().over(Window.partitionBy("side", "bucket")
          .orderBy(col("q").desc, col("p"))) + col("off"))
          .cast("bigint").as("rank"))
  }

  /** Brier score over (event_type, cu6, pos) rows — confidence in
    * micro-units (10⁶), outcome 0/1: mean of (p − y)², assembled as
    * the exact integer sum of squared micro-unit gaps then ONE
    * integer division per group (brier_units = sq_units div n, in
    * 10⁻¹² units — micro, not the calibration family's nano, so the
    * per-row square stays ≤ 10¹² and the group sum inside int64 to
    * ~10⁶ rows/group; DECIMAL(38) past that). Map-side arithmetic,
    * one two-phase rollup — the agg_pricing plan shape. Factored so
    * the spec can pin the closed-form bounds (perfect forecast → 0,
    * maximally wrong → 1).
    */
  private[graft] def brierOf(e: DataFrame): DataFrame =
    e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum((col("cu6") - col("pos") * lit(1000000L))
          * (col("cu6") - col("pos") * lit(1000000L))).as("sq_units"))
      .select(col("event_type"), col("n"), col("sq_units"),
        expr("sq_units div n").as("brier_units"),
        Q.dec6(round(expr("sq_units div n").cast("double")
          / lit(1000000000000.0), 6)).as("brier"))
      .orderBy("event_type")

  def defs: Map[String, Q] = Map(

    // LINK PREDICTION — the graph family's recommendation member
    // (which part–part edges does the order history predict?):
    // resource-allocation scores (Zhou 2009 — RA beats common
    // neighbors and Adamic-Adar on accuracy in their benchmark, and
    // its 1/deg weight is integer-exact where AA's 1/ln(deg) is not)
    // for query parts ≡ 1 (mod 97), top-5 predicted neighbors each.
    // Bipartite same-side prediction means candidate pairs are never
    // existing edges — no anti-join needed. Join-free basket shape;
    // the oracle states the same scores via the explicit
    // edges⋈edges⋈degrees definition, so the gate proves the basket
    // fan-out equals the textbook formula.
    "graph_linkpred" -> Q(
      """WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_orderkey AS o
        |            FROM read_parquet('{sfDir}/lineitem.parquet')),
        |dego AS (SELECT o, COUNT(*) AS deg FROM e0 GROUP BY 1),
        |q AS (SELECT p AS px, o FROM e0 WHERE p % 97 = 1),
        |c AS (SELECT q.px, e0.p AS py, e0.o FROM q JOIN e0 ON q.o = e0.o
        |      WHERE e0.p != q.px),
        |s AS (SELECT px, py, CAST(COUNT(*) AS BIGINT) AS cn,
        |        CAST(SUM(1000000000 // deg) AS BIGINT) AS ra_units
        |      FROM c JOIN dego ON c.o = dego.o GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY px
        |        ORDER BY ra_units DESC, cn DESC, py) AS rn FROM s)
        |SELECT px, py, cn, ra_units FROM r WHERE rn <= 5
        |ORDER BY px, ra_units DESC, cn DESC, py""".stripMargin) { (s, d) =>
      val gn = org.apache.spark.sql.graft.native
      val e0 = T.lineitem(s, d)
        .select(col("l_partkey").as("p"), col("l_orderkey").as("o"))
      gn.top_k_per_group(linkPredScores(e0, queryMod = 97), Seq("px"),
          Seq(col("ra_units").desc, col("cn").desc, col("py").asc), 5)
        .select("px", "py", "cn", "ra_units")
        .orderBy(col("px"), col("ra_units").desc, col("cn").desc, col("py"))
    },

    // RECALL@K / PRECISION@K — the eval family's set-retrieval member
    // (MRR grades the first hit, NDCG the graded order; recall@k
    // grades COVERAGE of the positive set — the retrieval-pipeline
    // acceptance metric). k = 50 on eval_avg_precision's shared
    // (seg, score, pos) fixture, pessimistic ties, hits counted by
    // the order-free group clamp (no per-row ranking).
    "eval_recall_at_k" -> Q(
      """WITH e AS (SELECT user_id % 4 AS seg, value AS score,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |g AS (SELECT seg, score, count(*) AS cnt, sum(pos) AS np
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT seg, cnt, np,
        |    coalesce(sum(cnt) OVER (PARTITION BY seg ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumcnt
        |  FROM g),
        |t AS (SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n,
        |        CAST(SUM(np) AS BIGINT) AS n_pos,
        |        CAST(SUM(GREATEST(0, LEAST(np, 50 - cumcnt - (cnt - np))))
        |             AS BIGINT) AS hits
        |      FROM r GROUP BY 1)
        |SELECT CAST(seg AS BIGINT) AS seg, n, n_pos, hits,
        |  CAST(COALESCE((hits * 1000000000) // NULLIF(n_pos, 0), 0)
        |       AS BIGINT) AS recall_units,
        |  CAST((hits * 1000000000) // 50 AS BIGINT) AS precision_units
        |FROM t ORDER BY seg""".stripMargin) { (s, d) =>
      recallAtK(T.events(s, d).select((col("user_id") % 4).as("seg"),
        col("value").as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos")),
        k = 50)
    },

    // COLLOCATIONS — Dice-scored bigram association (the phrase-mining
    // pass of a curation vocabulary build): top-20 adjacent-token
    // pairs by 2·f(xy)/(f(x)+f(y)) with f(xy) ≥ 3, exact nano-unit
    // integer scores. text_ngram_freq's raw top-20 is frequency
    // (dominated by function-word pairs); this is STRENGTH — the two
    // together are the standard collocation contrast.
    "text_collocations" -> Q(
      """WITH w AS (SELECT string_split(text, ' ') AS ws
        |           FROM read_parquet('{sfDir}/documents.parquet')),
        |bg AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
        |         j -> struct_pack(w1 := ws[j], w2 := ws[j + 1]))) AS b FROM w),
        |cxy AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
        |        FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |uni AS (SELECT unnest(ws) AS wd FROM w),
        |cu AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1)
        |SELECT w1, w2, c_xy, a.c AS c1, b.c AS c2,
        |  CAST((2 * c_xy * 1000000000) // (a.c + b.c) AS BIGINT) AS dice_units
        |FROM cxy JOIN cu a ON cxy.w1 = a.wd JOIN cu b ON cxy.w2 = b.wd
        |ORDER BY dice_units DESC, w1, w2 LIMIT 20""".stripMargin) { (s, d) =>
      diceCollocations(T.documents(s, d), minCount = 3L)
        .orderBy(col("dice_units").desc, col("w1"), col("w2"))
        .limit(20)
    },

    // SPEARMAN RANK CORRELATION — the distribution-free dependence
    // measure (agg_corr's rank sibling, Spearman 1904): do the two
    // length signals a curation pass computes (chars, tokens) order
    // documents the same way? Tie-corrected via average ranks on the
    // collapsed value domains; ρ ≈ 0.997 at every SF (the two
    // measures nearly agree, not exactly — a live, non-degenerate
    // gate).
    "agg_spearman" -> Q(
      """WITH d AS (SELECT n_chars AS a, len(string_split(text, ' ')) AS b
        |           FROM read_parquet('{sfDir}/documents.parquet')),
        |j0 AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1, 2),
        |sc AS (SELECT cnt,
        |    2 * coalesce(SUM(cnt) OVER (ORDER BY a
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + SUM(cnt) OVER (ORDER BY a RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
        |      + 1 AS x,
        |    2 * coalesce(SUM(cnt) OVER (ORDER BY b
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + SUM(cnt) OVER (ORDER BY b RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
        |      + 1 AS y
        |  FROM j0),
        |s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |        CAST(SUM(cnt * x) AS BIGINT) AS sx,
        |        CAST(SUM(cnt * y) AS BIGINT) AS sy,
        |        CAST(SUM(cnt * x * x) AS BIGINT) AS sxx,
        |        CAST(SUM(cnt * y * y) AS BIGINT) AS syy,
        |        CAST(SUM(cnt * x * y) AS BIGINT) AS sxy
        |      FROM sc)
        |SELECT n, sxy AS sum_rankprod,
        |  CAST(ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |    AS DECIMAL(18,6)) AS rho
        |FROM s""".stripMargin) { (s, d) =>
      spearmanOf(T.documents(s, d).select(col("n_chars").as("a"),
        size(split(col("text"), " ")).cast("bigint").as("b")))
    },

    // GINI COEFFICIENT — corpus inequality profile (how concentrated
    // is document length?): the data-balance diagnostic a mixture
    // builder reads before weighting sources. Tie-corrected
    // mean-difference form, both divisions factored out of the gate.
    "agg_gini" -> Q(
      """WITH d AS (SELECT n_chars AS x FROM read_parquet('{sfDir}/documents.parquet')),
        |g AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
        |r AS (SELECT x, cnt, coalesce(SUM(cnt) OVER (ORDER BY x
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumcnt
        |      FROM g),
        |s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |        CAST(SUM(x * cnt) AS BIGINT) AS sx,
        |        CAST(SUM((2 * cumcnt + cnt + 1) * x * cnt) AS BIGINT) AS twoixsum
        |      FROM r)
        |SELECT n, sx AS total,
        |  CAST(twoixsum - (n + 1) * sx AS BIGINT) AS gini_num,
        |  CAST(n * sx AS BIGINT) AS gini_den,
        |  CAST(ROUND(CAST(twoixsum - (n + 1) * sx AS DOUBLE)
        |             / CAST(n * sx AS DOUBLE), 6) AS DECIMAL(18,6)) AS gini
        |FROM s""".stripMargin) { (s, d) =>
      giniOf(T.documents(s, d).select(col("n_chars").as("x")))
    },

    // DEGREE ASSORTATIVITY — Newman (2002) degree-mixing coefficient:
    // the Pearson correlation of (deg(u), deg(v)) over the directed
    // edge list, the one-number profile of hub wiring (social graphs
    // +, bipartite/hub-and-spoke −; this order–part graph reads
    // ≈ −0.91 at every SF). The SYMMETRIC edge list makes the (x, y)
    // degree-pair multiset its own transpose, so sy = sx and
    // syy = sxx structurally — one broadcast attach of deg onto the
    // v endpoint plus a bucket-co-located per-u rollup (du = count,
    // snbr = Σ deg(v)) folds every power sum without a second join:
    // n = Σdu, sx = Σdu², sxx = Σdu³, sxy = Σ du·snbr (measured
    // 1.17 → 0.8 s vs the two-broadcast double-join form). At a scale
    // where nodes outgrow a broadcast, pre-attach degrees into the
    // staged edge relation (one more column, the positions-column
    // precedent). Gate columns are exact integer power-sum
    // assemblies (the agg_corr discipline); n·sxy ≈ 4·10¹⁵ at sf0.1,
    // DECIMAL(38) past ~10⁹ edges. The oracle assembles all six sums
    // from the explicit double join, so the gate also re-proves the
    // symmetry folding.
    "graph_assortativity" -> Q(
      """WITH e0 AS (SELECT DISTINCT l_orderkey * 2 AS a, l_partkey * 2 + 1 AS b
        |            FROM read_parquet('{sfDir}/lineitem.parquet')),
        |e AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0),
        |dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |j AS (SELECT dx.deg AS x, dy.deg AS y
        |      FROM e JOIN dg dx ON e.u = dx.u JOIN dg dy ON e.v = dy.u),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |        CAST(SUM(y * y) AS BIGINT) AS syy,
        |        CAST(SUM(x * y) AS BIGINT) AS sxy
        |      FROM j)
        |SELECT n AS n_edges, sx AS sum_deg, sxy AS sum_degprod,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS r_num,
        |  CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           * CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |    AS DECIMAL(18,6)) AS r
        |FROM s""".stripMargin) { (s, d) =>
      assortativityOf(s.table(Extra23.stagedGraphEdges(s, d)).select("u", "v"))
    },

    // BRIER SCORE — probabilistic-forecast quality (Brier 1950), the
    // squared-error companion to eval_calibration's ECE on the SAME
    // confidence fixture (the value fraction as p, purchase as y):
    // calibration asks "do confidences match frequencies per bin";
    // Brier asks "how far is each forecast from its outcome" — both
    // sides of a forecast audit. Per event_type so the gate carries
    // five live rows; exact micro-unit integer assembly, one integer
    // division per group.
    "eval_brier" -> Q(
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(FLOOR((value - FLOOR(value)) * 1000000) AS BIGINT) AS cu6,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM((cu6 - pos * 1000000) * (cu6 - pos * 1000000))
        |             AS BIGINT) AS sq_units
        |      FROM e GROUP BY 1)
        |SELECT event_type, n, sq_units,
        |  CAST(sq_units // n AS BIGINT) AS brier_units,
        |  CAST(ROUND(CAST(sq_units // n AS DOUBLE) / 1000000000000.0, 6)
        |       AS DECIMAL(18,6)) AS brier
        |FROM s ORDER BY event_type""".stripMargin) { (s, d) =>
      brierOf(T.events(s, d).select(col("event_type"),
        floor((col("value") - floor(col("value"))) * lit(1000000.0))
          .cast("bigint").as("cu6"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos")))
    },

    // COHEN'S KAPPA — chance-corrected annotator agreement (Cohen
    // 1960), the label-QA metric every human-annotation pipeline
    // gates on. Raters here are the two length-derived quality
    // buckets a curation pass actually computes (chars-based vs
    // token-based, 4 levels) — genuinely correlated, genuinely
    // imperfect, so κ lands strictly inside (0, 1) at every SF.
    // Both divisions factored out: the gate columns are exact
    // integers, κ itself one trailing rounded division.
    "eval_cohens_kappa" -> Q(
      """WITH r AS (SELECT LEAST(n_chars // 200, 3) AS r1,
        |                  LEAST(len(string_split(text, ' ')) // 40, 3) AS r2
        |           FROM read_parquet('{sfDir}/documents.parquet')),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        |so AS (SELECT CAST(COUNT(*) AS BIGINT) AS so FROM r WHERE r1 = r2),
        |rm AS (SELECT r1 AS c, CAST(COUNT(*) AS BIGINT) AS rc FROM r GROUP BY 1),
        |cm AS (SELECT r2 AS c, CAST(COUNT(*) AS BIGINT) AS cc FROM r GROUP BY 1),
        |se AS (SELECT CAST(SUM(rm.rc * cm.cc) AS BIGINT) AS sum_rc
        |       FROM rm JOIN cm ON rm.c = cm.c)
        |SELECT n.n, so.so, se.sum_rc,
        |  CAST(n.n * so.so - se.sum_rc AS BIGINT) AS kappa_num,
        |  CAST(n.n * n.n - se.sum_rc AS BIGINT) AS kappa_den,
        |  CAST(ROUND(CAST(n.n * so.so - se.sum_rc AS DOUBLE)
        |       / NULLIF(CAST(n.n * n.n - se.sum_rc AS DOUBLE), 0.0), 6)
        |       AS DECIMAL(18,6))
        |    AS kappa
        |FROM n, so, se""".stripMargin) { (s, d) =>
      kappaOf(T.documents(s, d).select(
        expr("least(n_chars div 200, 3)").cast("bigint").as("r1"),
        expr("least(size(split(text, ' ')) div 40, 3)").cast("bigint").as("r2")))
    },

    // AUTOCORRELATION — lag-1..3 Pearson autocorrelation per event
    // series: the serial-dependence profile (is this feed i.i.d. or
    // trending?) that sits beside ts_changepoint's level-shift
    // localization in a drift monitor. One window computes all three
    // leads in one pass; exact integer power sums in cents.
    "ts_autocorr" -> Q(
      """WITH v AS (SELECT event_type,
        |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |      ts, event_id FROM read_parquet('{sfDir}/events.parquet')),
        |l AS (SELECT event_type, x,
        |        LEAD(x, 1) OVER w AS y1, LEAD(x, 2) OVER w AS y2,
        |        LEAD(x, 3) OVER w AS y3
        |      FROM v WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
        |p AS (SELECT event_type, lag, x, y FROM l
        |      CROSS JOIN LATERAL (VALUES (1, y1), (2, y2), (3, y3)) AS t(lag, y)
        |      WHERE y IS NOT NULL),
        |s AS (SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        CAST(SUM(x * x) AS BIGINT) AS sxx,
        |        CAST(SUM(y * y) AS BIGINT) AS syy,
        |        CAST(SUM(x * y) AS BIGINT) AS sxy
        |      FROM p GROUP BY 1, 2)
        |SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
        |  sxy AS sxy_cents2,
        |  CAST(ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
        |           * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
        |    AS DECIMAL(18,6)) AS r
        |FROM s ORDER BY event_type, lag""".stripMargin) { (s, d) =>
      autocorrOf(T.events(s, d).select(col("event_type"),
        (Q.dec2(col("value")) * 100).cast("bigint").as("x"),
        col("ts"), col("event_id")), maxLag = 3)
    },

    // TRENDING MOVERS — rank movement between two time halves: which
    // parts climbed furthest in the demand ranking from the early to
    // the late half of the order history? The snapshot-over-snapshot
    // "movers" profile a source monitor reads (the rank sibling of
    // cdc_diff's value diff). Served from the staged bucketed layout
    // (both halves' rollups ride the exchange-free o_orderkey join);
    // both halves rank via ONE shared two-phase range-partitioned
    // pass (r16): side-tagged union, range-shuffle into K buckets
    // (side leads the key), rank locally per (side, bucket), add
    // broadcast per-side offsets, pivot back on p — no unpartitioned
    // window over the |parts| domain. Measured trade at sf0.1: the
    // r15 single-sort window read 0.94 s quiet; the first two-phase
    // form (per-half rank pair) 1.89; this shared pass 1.61 under a
    // ~1.2-1.7x ambient window — the residual +0.3-0.4 s is fixed
    // stage overhead for the form that parallelizes at 100x |parts|,
    // where a single-task sort would be the bottleneck.
    // Ranks, split day and climb are exact integers; nulls
    // never enter a window (each half filters BEFORE ranking — no
    // cross-engine null-ordering dependence); inner join keeps parts
    // present in both halves, identically in both engines; the final
    // cut is TakeOrderedAndProject on the (climb DESC, p) total order.
    "ts_trending" -> Q(
      """WITH o AS (SELECT l_partkey AS p, CAST(l_quantity AS BIGINT) AS qty,
        |             CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
        |           FROM read_parquet('{sfDir}/lineitem.parquet') l
        |           JOIN read_parquet('{sfDir}/orders.parquet') o
        |             ON l.l_orderkey = o.o_orderkey),
        |mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS m FROM (
        |          SELECT CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
        |          FROM read_parquet('{sfDir}/orders.parquet'))),
        |a AS (SELECT p, SUM(qty) AS q FROM o, mid WHERE day < m GROUP BY 1),
        |b AS (SELECT p, SUM(qty) AS q FROM o, mid WHERE day >= m GROUP BY 1),
        |ra AS (SELECT p, ROW_NUMBER() OVER (ORDER BY q DESC, p) AS r FROM a),
        |rb AS (SELECT p, ROW_NUMBER() OVER (ORDER BY q DESC, p) AS r FROM b),
        |j AS (SELECT ra.p, CAST(ra.r AS BIGINT) AS r_early,
        |        CAST(rb.r AS BIGINT) AS r_late,
        |        CAST(ra.r - rb.r AS BIGINT) AS climb
        |      FROM ra JOIN rb ON ra.p = rb.p)
        |SELECT p, r_early, r_late, climb FROM j
        |ORDER BY climb DESC, p LIMIT 10""".stripMargin) { (s, d) =>
      val (to, tl) = Extra10.bucketedTables(s, d)
      val o = s.table(tl)
        .select(col("l_orderkey"), col("l_partkey").as("p"),
          col("l_quantity").cast("bigint").as("qty"))
        .join(s.table(to).select(col("o_orderkey").as("l_orderkey"),
          expr("unix_timestamp(o_orderdate) div 86400").as("day")), "l_orderkey")
      // ONE fact-join pass total: the split day comes from the orders
      // CALENDAR alone (a one-column scan — the join pass the first
      // form spent on it was pure waste, and the oracle states the
      // same orders-table domain), one conditional-aggregation pass
      // produces both halves' sums, and that 20k-row rollup is
      // lazily localCheckpoint-ed so the two rank branches (different
      // sort orders, unavoidable) read the cut state instead of
      // re-deriving the fact join per branch (the text_bpe_encode
      // checkpointed-state recipe). Measured at sf0.1: per-branch
      // rankedHalf 3 join passes 2.1 s; shared agg via sketchPersist
      // 1.35-1.48 s (cache-manager overhead per construction); the
      // checkpoint shape 0.94 s.
      val mid = s.table(to)
        .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"))
        .agg(expr("(min(day) + max(day) + 1) div 2").as("m"))
      val halves = o.crossJoin(broadcast(mid))
        .groupBy("p")
        .agg(sum(when(col("day") < col("m"), col("qty"))).as("qa"),
          sum(when(col("day") >= col("m"), col("qty"))).as("qb"))
        .transform(graft.Q.cut(_, eager = false))
      // domainBound: l_partkey is a part-table FK, so the rank domain
      // is ≤ |part| — read from footer metadata (no job), making the
      // single-window/two-phase rank choice track the DATA, not the
      // deployment (see rankClimbOf).
      rankClimbOf(halves,
        domainBound = graft.Q.parquetRowCount(s, s"$d/part.parquet"))
        .orderBy(col("climb").desc, col("p"))
        .limit(10)
    },

    // CROSS-CORRELATION — daily click→purchase lead-lag profile at
    // lags 0..2: does today's click volume predict purchase volume k
    // days out? The cross-series sibling of ts_autocorr and the
    // funnel-level drift signal a feed monitor reads. Day counts
    // collapse the corpus to a 30-row calendar relation; everything
    // after the one filtered rollup is broadcast-sized.
    "ts_cross_corr" -> Q(
      """WITH b AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
        |             event_type FROM read_parquet('{sfDir}/events.parquet')
        |           WHERE event_type IN ('click', 'purchase')),
        |c AS (SELECT day,
        |        CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS cx,
        |        CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS cy
        |      FROM b GROUP BY 1),
        |p AS (SELECT l.lag, a.cx AS x, y2.cy AS y
        |      FROM c a CROSS JOIN (VALUES (0), (1), (2)) AS l(lag)
        |      JOIN c y2 ON y2.day = a.day + l.lag),
        |s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        CAST(SUM(x * x) AS BIGINT) AS sxx,
        |        CAST(SUM(y * y) AS BIGINT) AS syy,
        |        CAST(SUM(x * y) AS BIGINT) AS sxy
        |      FROM p GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n_pairs, sxy AS sum_prod,
        |  CAST(ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
        |           * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
        |    AS DECIMAL(18,6)) AS r
        |FROM s ORDER BY lag""".stripMargin) { (s, d) =>
      val c = T.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(expr("unix_timestamp(ts_us) div 86400").as("day"),
          col("event_type"))
        .groupBy("day")
        .agg(count(when(col("event_type") === "click", 1)).as("cx"),
          count(when(col("event_type") === "purchase", 1)).as("cy"))
      crossCorrOf(c, maxLag = 2)
    },

    // CHANGEPOINT — CUSUM drift localization per event series (Page
    // 1954): WHERE did the level shift, not just which points are
    // outliers (ts_outlier/_mad) — the distribution-drift monitor a
    // feed pipeline runs per source. Exact integers end-to-end: cents
    // via DECIMAL(18,2), the mean division factored out of the
    // statistic, min-index tie resolution.
    "ts_changepoint" -> Q(
      """WITH v AS (SELECT event_type,
        |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |      ts, event_id FROM read_parquet('{sfDir}/events.parquet')),
        |r AS (SELECT event_type, cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY ts, event_id) AS i,
        |    SUM(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
        |  FROM v),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(cents) AS BIGINT) AS tot FROM v GROUP BY 1),
        |c AS (SELECT r.event_type, r.i, ABS(s.n * r.pre - r.i * s.tot) AS ac
        |      FROM r JOIN s ON r.event_type = s.event_type),
        |m AS (SELECT event_type, CAST(MAX(ac) AS BIGINT) AS cusum_units
        |      FROM c GROUP BY 1),
        |k AS (SELECT c.event_type, CAST(MIN(c.i) AS BIGINT) AS k
        |      FROM c JOIN m ON c.event_type = m.event_type
        |                   AND c.ac = m.cusum_units GROUP BY 1)
        |SELECT s.event_type, s.n, s.tot AS tot_cents, k.k, m.cusum_units
        |FROM s JOIN m ON s.event_type = m.event_type
        |       JOIN k ON s.event_type = k.event_type
        |ORDER BY s.event_type""".stripMargin) { (s, d) =>
      cusumChangepoint(T.events(s, d).select(col("event_type"),
        (Q.dec2(col("value")) * 100).cast("bigint").as("cents"),
        col("ts"), col("event_id")))
    }
  )
}
