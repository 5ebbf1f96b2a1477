package graft.queries

import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Round-10 additions, part 11: the snapshot differential (CDC diff),
  * declared connected components, int8 embedding quantization, and the
  * exact sliding median.
  *
  * Each fills a distinct user-visible hole: cdc_diff is the
  * compare-two-snapshots primitive every incremental pipeline starts
  * from; graph_components promotes the `ops/Components` machinery
  * (previously exercised only inside dedup_cluster's oracle path) to a
  * first-class declared operator; embed_quantize is the storage-side
  * half of the ANN family (int8 scalar quantization is how a 100 TB
  * embedding corpus becomes a 25 TB one before IVF/PQ indexing); and
  * win_median adds the order-statistic window the win_* family lacked.
  */
object Extra21 {

  /** eval_confusion's declared shape, factored for the scale probe:
    * micro-unit integer distances, broadcast centroid ARRAYS, map-side
    * zip_with Σ(x−c)², single-groupBy argmin via min(struct(d2, label)).
    *
    * Round-11 rework: the r10 form exploded BOTH sides to per-position
    * rows — the distance aggregation pushed |V|·64·|labels| rows
    * (1.28M at the fixture) through a shuffle, then a per-vector
    * window supplied the argmin (two more exchanges + sorts). The
    * explode is only needed to BUILD the centroids (64·|labels| cells
    * — an irreducible position rollup); the distances themselves are
    * array arithmetic: collect each centroid back to an array, cross
    * the |labels|-row frame in as a broadcast, and Σ(x−c)² is one
    * zip_with/aggregate per (vector, centroid) — |V|·|labels| rows
    * (20k), never |V|·64·|labels|. The argmin then needs no window:
    * min(struct(d2, clabel)) under one groupBy(vec_id) IS the (d2,
    * label) tie-broken argmin (struct ordering is lexicographic — the
    * IVF assign idiom). Higher-order-function lambdas are interpreted,
    * not codegen'd, but 20k×64 interpreted multiplies lose to pushing
    * 1.28M rows through two extra exchanges by a wide margin (measured
    * 1.53 → 1.11 s end-to-end on the r11 box, the smaller number
    * taken UNDER ambient contention — the clean delta is larger;
    * three exchanges and two sorts leave the plan). Scale shape: the only
    * wide thing is the corpus scan; centroids are KB at any corpus
    * size, and the 64× row inflation never crosses a wire.
    */
  def confusionOf(emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cent = emb
      .select(col("label").as("clabel"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("clabel", "pos")
      .agg(round(avg(col("v").cast("double")) * 1000000, 0)
        .cast("bigint").as("c"))
      .groupBy("clabel")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)")
        .as("cvec"))
    emb
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, v -> " +
          "cast(round(cast(v as double) * 1000000, 0) as bigint))").as("xvec"))
      .crossJoin(broadcast(cent))
      // Length guard (ADVICE r11): zip_with pads the shorter array
      // with nulls, so a malformed embedding (size ≠ centroid dim)
      // would make d2 NULL — and nulls sort FIRST in the struct-min
      // argmin, silently classifying the corrupt vector as the
      // lexicographically smallest label. raise_error names the bad
      // row instead; the conditional is constant-folded against the
      // size comparison per row (one branch, no plan change).
      // A NULL embedding must trip the same guard explicitly (ADVICE
      // r12): size(NULL) is NULL, so `=!=` alone evaluates to NULL —
      // the when falls through and d2 goes NULL, i.e. exactly the
      // silent-smallest-label corruption the guard exists to close,
      // via a different corrupt input. isNull is checked FIRST.
      .select(col("vec_id"), col("label"), struct(
        when(col("xvec").isNull || size(col("xvec")) =!= size(col("cvec")),
          raise_error(concat(lit("eval_confusion: embedding length "),
            // coalesce: a NULL xvec must not null out the concat and
            // degrade the named error into a message-less one
            coalesce(size(col("xvec")).cast("string"), lit("NULL")),
            lit(" != centroid dim "), size(col("cvec")).cast("string"),
            lit(" at vec_id="), col("vec_id").cast("string"))).cast("bigint"))
          .otherwise(
            // r16: native codegen'd kernel replaces the interpreted
            // aggregate(zip_with(...)) lambda pair — HOFs are
            // CodegenFallback, and the per-element dispatch plus the
            // zipped-array allocation dominated this 20k-row × 64-dim
            // pass (guide §4; the CosineSimilarity precedent). Same
            // exact integer sum; the size guard above still owns the
            // ragged-input contract.
            org.apache.spark.sql.graft.native
              .sq_dist_long(col("xvec"), col("cvec"))).as("d2"),
        col("clabel")).as("cand"))
      .groupBy("vec_id", "label")
      .agg(min(col("cand")).as("best"))
      .groupBy(col("label"), col("best.clabel").as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  val defs: Map[String, Q] = Map(

    // SNAPSHOT DIFFERENTIAL (CDC diff) — classify every key across two
    // snapshots of the same table as insert / delete / update /
    // unchanged. This is ONE full-outer hash join on the key — the
    // classification is a projection over the join's null pattern, so
    // the whole diff is a single shuffle co-partitioned on the key (at
    // warehouse scale both snapshots are typically already bucketed or
    // clustered by that key, making the exchange free). Snapshots
    // derive deterministically from the orders fixture: "old" drops
    // keys ≡0 (mod 97), "new" drops keys ≡0 (mod 89) and bumps the
    // price by exactly +1.0 on keys ≡0 (mod 13) — +1.0 on a double of
    // this magnitude is exact, so the update predicate is bit-precise
    // on both engines. Checksums (count + key-sum per class) make the
    // oracle sensitive to any misclassified row.
    "cdc_diff" -> Q(
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p
        |           FROM read_parquet('{sfDir}/orders.parquet')),
        |old AS (SELECT k, p FROM o WHERE k % 97 <> 0),
        |nw  AS (SELECT k, CASE WHEN k % 13 = 0 THEN p + 1.0 ELSE p END AS p
        |        FROM o WHERE k % 89 <> 0)
        |SELECT CASE WHEN a.k IS NULL THEN 'insert'
        |            WHEN b.k IS NULL THEN 'delete'
        |            WHEN a.p <> b.p THEN 'update'
        |            ELSE 'unchanged' END AS change,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(coalesce(a.k, b.k)) AS BIGINT) AS key_sum
        |FROM old a FULL OUTER JOIN nw b ON a.k = b.k
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val o = T.orders(s, d).select(col("o_orderkey").as("k"),
        col("o_totalprice").as("p"))
      val old = o.filter(col("k") % 97 =!= 0)
      val nw = o.filter(col("k") % 89 =!= 0)
        .withColumn("p", when(col("k") % 13 === 0, col("p") + lit(1.0))
          .otherwise(col("p")))
      old.as("a").join(nw.as("b"), col("a.k") === col("b.k"), "full_outer")
        .select(
          when(col("a.k").isNull, "insert")
            .when(col("b.k").isNull, "delete")
            .when(col("a.p") =!= col("b.p"), "update")
            .otherwise("unchanged").as("change"),
          coalesce(col("a.k"), col("b.k")).as("k"))
        .groupBy("change")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"))
        .orderBy("change")
    },

    // CONNECTED COMPONENTS, declared — `ops/Components` (single-task
    // union-find below the edge bound, iterative min-label propagation
    // with pointer jumping above it) against a ground-truth oracle:
    // DuckDB computes the full reachability closure via a recursive CTE
    // and takes min(label) per node — exactly the semantics, with none
    // of the scaling (closure is Σ|component|², affordable here because
    // the synthesized graph keeps components small). The graph derives
    // from customer keys: chain edges (c, c-1) broken at multiples of
    // 13 give runs of 13, and long-range edges (c, 2c) at multiples of
    // 97 splice runs together — the splices are what force real label
    // propagation across distant id ranges (a sorted-range shortcut
    // would get them wrong).
    "graph_components" -> Q(
      """WITH RECURSIVE cust AS (SELECT c_custkey AS id
        |    FROM read_parquet('{sfDir}/customer.parquet')),
        |ed0 AS (
        |  SELECT id AS s, id - 1 AS t FROM cust WHERE id % 13 <> 0 AND id > 0
        |  UNION ALL
        |  SELECT a.id AS s, b.id AS t FROM cust a JOIN cust b ON b.id = a.id * 2
        |  WHERE a.id % 97 = 0 AND a.id > 0),
        |ed AS (SELECT s, t FROM ed0 UNION ALL SELECT t AS s, s AS t FROM ed0),
        |r AS (SELECT id AS node, id AS lab FROM cust
        |      UNION
        |      SELECT e.t AS node, r.lab FROM r JOIN ed e ON e.s = r.node),
        |lab AS (SELECT node, min(lab) AS rep FROM r GROUP BY node)
        |SELECT CAST(rep AS BIGINT) AS rep, CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(max(node) AS BIGINT) AS max_id
        |FROM lab GROUP BY rep ORDER BY rep""".stripMargin) { (s, d) =>
      val c = T.customer(s, d).select(col("c_custkey").as("id"))
      val chain = c.filter(col("id") % 13 =!= 0 && col("id") > 0)
        .select(col("id").as("id1"), (col("id") - 1).as("id2"))
      val far = c.as("a")
        .filter(col("id") % 97 === 0 && col("id") > 0)
        .join(c.as("b"), col("b.id") === col("a.id") * 2)
        .select(col("a.id").as("id1"), col("b.id").as("id2"))
      val labels = graft.ops.Components
        .connectedComponents(c, chain.union(far))
      labels.groupBy(col("rep"))
        .agg(count(lit(1)).as("n_nodes"), max(col("id")).as("max_id"))
        .orderBy("rep")
    },

    // INT8 EMBEDDING QUANTIZATION — symmetric per-vector scalar
    // quantization (the storage form every large embedding corpus ships
    // in: 4× smaller than fp32 before any IVF/PQ indexing, and the
    // rerank stage dequantizes by one multiply). scale = max|x|/127 per
    // vector; code_i = round(x_i/scale). Everything is map-side — no
    // shuffle at all — and the codes are pure INTEGERS, so the oracle
    // match is exact: float→double casts are value-preserving, IEEE
    // division is bit-deterministic across engines, and round(·, 0) is
    // half-away-from-zero on both (Spark HALF_UP = away from zero on
    // ties; DuckDB likewise). The only guard is the all-zero vector
    // (scale 0 → NaN codes), floored at 1e-30 identically on both
    // sides. The code vector ships as a comma-joined STRING because the
    // driver's comparator cannot hash array cells (QueriesSpec pins
    // that constraint) — int→string formatting is canonical on both
    // engines, so the join stays exact. l1 (the sum of |code|) is the
    // drift tripwire: one flipped code anywhere changes it.
    "embed_quantize" -> Q(
      """WITH s AS (SELECT vec_id, label, embedding,
        |    greatest(list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-30) AS scale
        |  FROM read_parquet('{sfDir}/embeddings.parquet')),
        |q AS (SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) / scale, 0) AS INT)) AS code
        |  FROM s)
        |SELECT vec_id, label, array_to_string(code, ',') AS code_str,
        |  CAST(list_aggregate(list_transform(code,
        |    x -> abs(CAST(x AS BIGINT))), 'sum') AS BIGINT) AS l1
        |FROM q ORDER BY vec_id""".stripMargin) { (s, d) =>
      // The formula lives in Int8Index.int8Code (round-13): the IVF-SQ8
      // index (sim_ann_int8) stores EXACTLY this record, provably —
      // both bind the same column expression. tinyint→string prints the
      // same digits the old int cast did, so the oracle is unchanged.
      T.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          graft.ops.Int8Index.int8Code(col("embedding")).as("code"))
        .select(col("vec_id"), col("label"),
          array_join(transform(col("code"), _.cast("string")), ",")
            .as("code_str"),
          aggregate(col("code"), lit(0L),
            (acc, x) => acc + abs(x.cast("long"))).as("l1"))
        .orderBy("vec_id")
    },

    // EMBEDDING POOLING — element-wise aggregation of vectors per group
    // (how chunk embeddings become a document embedding, or class
    // centroids for probing): per (label, dim), the exact SUM and count
    // — mean pooling is their ratio, left to the caller so the declared
    // output stays hash-EXACT (each float is widened to DOUBLE — exact —
    // then cast to DECIMAL(18,6) before summing, making the sum
    // order-independent across partitionings AND engines; the double
    // widening matters because Spark quantizes a bare float→decimal
    // cast through the FLOAT's shortest string form, which rounds the
    // 6th decimal differently than DuckDB's exact-value cast on ~20%
    // of values — measured, not hypothetical).
    // Shape: the ×64 posexplode fans out map-side only — with 10
    // labels × 64 dims = 640 groups, partial aggregation collapses
    // each map task to ≤640 rows, so the exchange moves kilobytes no
    // matter the corpus size. The DuckDB side zips parallel unnests
    // (values + 0-based positions) to replay the same dimension keys.
    "embed_pool" -> Q(
      """SELECT label, dim,
        |  CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT label, unnest(embedding) AS x,
        |        unnest(generate_series(0, len(embedding) - 1)) AS dim
        |      FROM read_parquet('{sfDir}/embeddings.parquet'))
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin) { (s, d) =>
      T.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(sum(Q.dec6(col("x").cast("double"))).cast("decimal(38,6)").as("s"),
          count(lit(1)).as("n"))
        .orderBy("label", "dim")
    },

    // DISTRIBUTION DRIFT (population stability index) — the standard
    // "did my feature distribution move between snapshots" gate a
    // training pipeline runs before every data refresh: PSI_b =
    // (p_b − q_b)·ln(p_b/q_b) per bin, with p from the baseline
    // snapshot and q from the candidate. Drift is induced
    // deterministically (the candidate rewrites priority to 1-URGENT on
    // keys ≡0 mod 7, ~14% of rows — PSI lands in the 1e-2 range where
    // ROUND-4 is meaningfully sensitive). The whole computation is ONE
    // fact scan: both snapshots derive from the same rows, so a single
    // groupBy on the (old_bin, new_bin) CONTINGENCY CELL (≤25 rows)
    // carries both margins, and everything after is arithmetic over
    // that tiny frame (both margin re-aggs and the 1-row total are
    // sub-kilobyte — at 100 TB the fact is read and shuffled once, as
    // partial-aggregated cells). Counts are exact; only the final psi
    // carries the accepted round-4 double exposure (ln is last-ulp
    // stable at these magnitudes — the agg_entropy precedent).
    "dq_drift" -> Q(
      """WITH o AS (SELECT o_orderpriority AS po,
        |    CASE WHEN o_orderkey % 7 = 0 THEN '1-URGENT'
        |         ELSE o_orderpriority END AS pn
        |  FROM read_parquet('{sfDir}/orders.parquet')),
        |cells AS (SELECT po, pn, count(*) AS c FROM o GROUP BY 1, 2),
        |tot AS (SELECT sum(c) AS t FROM cells),
        |old AS (SELECT po AS bin, sum(c) AS n_old FROM cells GROUP BY 1),
        |nw  AS (SELECT pn AS bin, sum(c) AS n_new FROM cells GROUP BY 1)
        |SELECT bin, CAST(n_old AS BIGINT) AS n_old,
        |  CAST(n_new AS BIGINT) AS n_new,
        |  round((n_old / t - n_new / t)
        |        * ln((n_old / t) / (n_new / t)), 4) AS psi
        |FROM old JOIN nw USING (bin) CROSS JOIN tot
        |ORDER BY bin""".stripMargin) { (s, d) =>
      val o = T.orders(s, d).select(
        col("o_orderpriority").as("po"),
        when(col("o_orderkey") % 7 === 0, lit("1-URGENT"))
          .otherwise(col("o_orderpriority")).as("pn"))
      val cells = o.groupBy("po", "pn").agg(count(lit(1)).as("c"))
        .transform(graft.Q.sketchPersist)
      val tot = cells.agg(sum("c").as("t"))
      val old = cells.groupBy(col("po").as("bin")).agg(sum("c").as("n_old"))
      val nw = cells.groupBy(col("pn").as("bin")).agg(sum("c").as("n_new"))
      val p = col("n_old").cast("double") / col("t")
      val q = col("n_new").cast("double") / col("t")
      old.join(nw, Seq("bin")).crossJoin(broadcast(tot))
        .select(col("bin"), col("n_old"), col("n_new"),
          round((p - q) * log(p / q), 4).as("psi"))
        .orderBy("bin")
    },

    // CONFUSION MATRIX (nearest-centroid classifier eval) — the other
    // standard ML-eval rollup: predict each vector's class as its
    // nearest per-label centroid, then count (true, predicted) cells.
    // Cross-engine argmin over float distances is normally a trap (an
    // ulp at the decision boundary flips the prediction), so distances
    // are EXACT INTEGER: every element and centroid quantizes to
    // micro-units (round(x·10⁶) as BIGINT — the sim_knn_label
    // round-at-6dp discipline in integer clothing), and Σ(x−c)² of
    // bigints stays under 2⁶³ at 64 dims — order-free, engine-free,
    // and codegen'd (a DECIMAL form was exact too but 3× slower:
    // BigDecimal sums force ObjectHashAggregate on the 3.2M-row
    // fan-out; bigint sums collapse map-side in whole-stage codegen).
    // Argmin tie-breaks on label id. Shape: corpus posexplodes ×64,
    // joins the BROADCAST 640-row centroid table on position, one
    // map-collapsed (vec, label) rollup shuffle, a row_number argmin
    // over 10 rows per vector, one 100-cell final count.
    "eval_confusion" -> Q(
      """WITH cent AS (
        |  SELECT label AS clabel, p AS pos,
        |         CAST(ROUND(AVG(CAST(embedding[p] AS DOUBLE)) * 1000000, 0)
        |              AS BIGINT) AS c
        |  FROM read_parquet('{sfDir}/embeddings.parquet')
        |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS p) ps
        |  GROUP BY label, p),
        |x AS (SELECT vec_id, label,
        |        unnest(generate_series(1, 64)) AS pos,
        |        CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0)
        |             AS BIGINT) AS xd
        |      FROM read_parquet('{sfDir}/embeddings.parquet')),
        |dist AS (SELECT x.vec_id, x.label, cent.clabel,
        |    sum((x.xd - cent.c) * (x.xd - cent.c)) AS d2
        |  FROM x JOIN cent ON x.pos = cent.pos
        |  GROUP BY 1, 2, 3),
        |pred AS (SELECT vec_id, label, clabel AS pred, row_number()
        |    OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
        |  FROM dist)
        |SELECT label, pred, CAST(count(*) AS BIGINT) AS n
        |FROM pred WHERE rn = 1
        |GROUP BY label, pred ORDER BY label, pred""".stripMargin) { (s, d) =>
      confusionOf(T.embeddings(s, d)).orderBy("label", "pred")
    },

    // NDCG@10 (retrieval eval) — grade a similarity ranking against
    // binary relevance (same label = relevant): DCG = Σ rel_i/log2(i+1)
    // over each probe's top-10 under the (sim DESC, nid) total order —
    // the sim_hardneg ranking machinery graded instead of mined. With
    // ≥10 relevant candidates per label in the corpus the ideal DCG is
    // the constant Σ_{i≤10} 1/log2(i+1), so NDCG = DCG/IDCG stays a
    // per-query scalar. Shape: 8 broadcast probes against one corpus
    // scan, the two-phase WindowGroupLimit bounded-heap cut, an 8-row
    // rollup. log2 rides round-4 (the agg_entropy transcendental
    // discipline); ranks and relevance are exact ints.
    "eval_ndcg" -> Q(
      """WITH p AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    CASE WHEN b.label = a.label THEN 1 ELSE 0 END AS rel,
        |    CAST(ROUND(list_cosine_similarity(a.embedding, b.embedding), 4)
        |         AS DECIMAL(18,4)) AS sim
        |  FROM read_parquet('{sfDir}/embeddings.parquet') a
        |  JOIN read_parquet('{sfDir}/embeddings.parquet') b
        |    ON a.vec_id < 8 AND b.vec_id <> a.vec_id),
        |r AS (SELECT qid, rel, row_number()
        |    OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM p),
        |d AS (SELECT qid,
        |    sum(rel / (ln(rn + 1.0) / ln(2.0))) AS dcg,
        |    CAST(sum(rel) AS BIGINT) AS n_rel
        |  FROM r WHERE rn <= 10 GROUP BY qid),
        |i AS (SELECT sum(1.0 / (ln(k + 1.0) / ln(2.0))) AS idcg
        |      FROM (SELECT unnest(generate_series(1, 10)) AS k))
        |SELECT qid, n_rel, round(dcg, 4) AS dcg,
        |  round(dcg / idcg, 4) AS ndcg
        |FROM d CROSS JOIN i ORDER BY qid""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val e = T.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qv"))
      val corpus = e.select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("embedding").as("nv"))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      val top = corpus.join(broadcast(qs), col("nid") =!= col("qid"))
        .select(col("qid"),
          when(col("nlabel") === col("qlabel"), 1).otherwise(0).as("rel"),
          col("nid"),
          round(org.apache.spark.sql.graft.native
            .cosine_similarity(col("qv"), col("nv")), 4)
            .cast(DecimalType(18, 4)).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
      val idcg = (1 to 10).map(k => 1.0 / (math.log(k + 1.0) / math.log(2.0))).sum
      top.groupBy("qid")
        .agg(sum(col("rel") / (log(col("rn") + 1.0) / log(lit(2.0))))
            .as("dcg0"),
          sum("rel").cast("bigint").as("n_rel"))
        .select(col("qid"), col("n_rel"), round(col("dcg0"), 4).as("dcg"),
          round(col("dcg0") / lit(idcg), 4).as("ndcg"))
        .orderBy("qid")
    },

    // EXACT DISTRIBUTED AUC — the rank-sum (Mann-Whitney U) form, the
    // only way AUC scales: sorting predictions once per segment and
    // summing positive ranks replaces the quadratic "compare every
    // (pos, neg) pair" definition. Ties get average ranks (the exact
    // tie-adjusted estimator), computed from a per-(segment, score)
    // pre-aggregation: the window then runs over DISTINCT scores (no
    // per-row state), start rank = 1 + cumulative count before the
    // group, average rank = start + (cnt−1)/2. Every term is a
    // half-integer well under 2^52, so double summation is EXACT in
    // any order and across engines — 2·U ships as a BIGINT (the hash
    // gate), AUC as its round-4 ratio. Shape: one (seg, score) rollup
    // shuffle, one per-seg window over the collapsed score domain,
    // one 4-row final agg.
    "agg_auc" -> Q(
      """WITH e AS (SELECT user_id % 4 AS seg, value AS score,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |g AS (SELECT seg, score, count(*) AS cnt, sum(pos) AS np
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT seg, score, cnt, np,
        |    1 + coalesce(sum(cnt) OVER (PARTITION BY seg ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS srank
        |  FROM g),
        |u AS (SELECT seg,
        |    sum((srank + (cnt - 1) / 2.0) * np) AS pos_rank_sum,
        |    sum(np) AS n_pos, sum(cnt) - sum(np) AS n_neg
        |  FROM r GROUP BY seg)
        |SELECT CAST(seg AS BIGINT) AS seg,
        |  CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  CAST(2 * (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) AS BIGINT)
        |    AS u2,
        |  round((pos_rank_sum - n_pos * (n_pos + 1) / 2.0)
        |        / (n_pos * n_neg), 4) AS auc
        |FROM u ORDER BY seg""".stripMargin) { (s, d) =>
      val e = T.events(s, d).select((col("user_id") % 4).as("seg"),
        col("value").as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val g = e.groupBy("seg", "score")
        .agg(count(lit(1)).as("cnt"), sum("pos").as("np"))
      val w = Window.partitionBy("seg").orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val u = g
        .withColumn("srank", lit(1) + coalesce(sum("cnt").over(w), lit(0L)))
        .groupBy("seg")
        .agg(sum((col("srank") + (col("cnt") - 1) / 2.0) * col("np"))
            .as("pos_rank_sum"),
          sum("np").as("n_pos"),
          (sum("cnt") - sum("np")).as("n_neg"))
      u.select(col("seg").cast("bigint").as("seg"),
          col("n_pos"), col("n_neg"),
          (lit(2) * (col("pos_rank_sum")
            - col("n_pos") * (col("n_pos") + 1) / 2.0)).cast("bigint")
            .as("u2"),
          round((col("pos_rank_sum")
            - col("n_pos") * (col("n_pos") + 1) / 2.0)
            / (col("n_pos") * col("n_neg")), 4).as("auc"))
        .orderBy("seg")
    },

    // BIDIRECTIONAL FLOW STITCHING — the canonical NetFlow post-process:
    // a TCP session exports as TWO unidirectional records (client→server
    // and server→client), and analytics want ONE bidirectional row with
    // per-direction byte counts and an unanswered-session flag (the scan
    // signal). Records synthesize from events via the fixed flow-address
    // formulas (flow_top_talkers' withFlowAddrs contract) — every event
    // a forward record, events ≢0 (mod 3) also a REVERSE record, emitted
    // from ONE scan by a map-side explode (never a second read or a
    // union of two scans). The stitch keys on the ORDER-CANONICAL
    // address pair (least, greatest) — exactly how collectors pair
    // directions without knowing which side initiated — one hash
    // shuffle; the /16 rollup after it is a 256-group two-phase agg.
    // Byte sums are exact integers (floor-scaled), so the oracle gate
    // is exact.
    "flow_bidir_merge" -> Q(
      """WITH h0 AS (
        |  SELECT ((user_id % 2147483647) * 2654435761) % 16777216 AS h,
        |         event_id, value
        |  FROM read_parquet('{sfDir}/events.parquet')
        |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
        |f AS (
        |  SELECT concat('10.', CAST((h // 65536) % 256 AS VARCHAR), '.',
        |                CAST((h // 256) % 256 AS VARCHAR), '.',
        |                CAST(h % 256 AS VARCHAR)) AS src_addr,
        |         concat('172.16.', CAST((event_id // 256) % 256 AS VARCHAR), '.',
        |                CAST(event_id % 256 AS VARCHAR)) AS dst_addr,
        |         event_id, value
        |  FROM h0),
        |recs AS (
        |  SELECT src_addr AS src, dst_addr AS dst,
        |         CAST(FLOOR(value * 1000) AS BIGINT) + 64 AS bytes FROM f
        |  UNION ALL
        |  SELECT dst_addr AS src, src_addr AS dst,
        |         CAST(FLOOR(value * 500) AS BIGINT) + 40 AS bytes FROM f
        |  WHERE event_id % 3 <> 0),
        |sess AS (
        |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
        |         SUM(CASE WHEN src = least(src, dst) THEN bytes ELSE 0 END) AS ab,
        |         SUM(CASE WHEN src = least(src, dst) THEN 0 ELSE bytes END) AS ba
        |  FROM recs GROUP BY 1, 2)
        |SELECT concat(string_split(a, '.')[1], '.',
        |              string_split(a, '.')[2], '.0.0/16') AS net16,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(CASE WHEN ab > 0 AND ba > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bidir,
        |  CAST(SUM(ab) AS BIGINT) AS total_ab,
        |  CAST(SUM(ba) AS BIGINT) AS total_ba
        |FROM sess GROUP BY net16 ORDER BY net16""".stripMargin) { (s, d) =>
      val f = graft.queries.Extra12.withFlowAddrs(
        T.events(s, d).select("event_id", "user_id", "value"))
      val fwd = struct(col("src_addr").as("src"), col("dst_addr").as("dst"),
        (floor(col("value") * 1000).cast("long") + 64).as("bytes"))
      val rev = struct(col("dst_addr").as("src"), col("src_addr").as("dst"),
        (floor(col("value") * 500).cast("long") + 40).as("bytes"))
      val recs = f.select(explode(
          when(col("event_id") % 3 =!= 0, array(fwd, rev))
            .otherwise(array(fwd))).as("r"))
        .select(col("r.src").as("src"), col("r.dst").as("dst"),
          col("r.bytes").as("bytes"))
      val sess = recs
        .withColumn("a", least(col("src"), col("dst")))
        .withColumn("b", greatest(col("src"), col("dst")))
        .groupBy("a", "b")
        .agg(sum(when(col("src") === col("a"), col("bytes")).otherwise(0L))
            .as("ab"),
          sum(when(col("src") === col("a"), 0L).otherwise(col("bytes")))
            .as("ba"))
      sess
        .withColumn("net16", concat(split(col("a"), "\\.").getItem(0),
          lit("."), split(col("a"), "\\.").getItem(1), lit(".0.0/16")))
        .groupBy("net16")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("ab") > 0 && col("ba") > 0, 1L).otherwise(0L))
            .as("n_bidir"),
          sum("ab").as("total_ab"), sum("ba").as("total_ba"))
        .orderBy("net16")
    },

    // HARD-NEGATIVE MINING — per query vector, the top-5 most-similar
    // candidates with a DIFFERENT label: the contrastive-training data
    // op (negatives that are hard precisely because they're close).
    // Shape: the 8 probe vectors broadcast against the corpus (linear
    // in N, one scan, no corpus self-join), label inequality rides the
    // join condition, and the per-query cut is a row_number window over
    // 8 tiny groups under the (sim DESC, nid) total order. Cosine is
    // the native codegen'd kernel; ROUND-4 + nid tie-break is the
    // sim-family determinism contract (same accepted last-ulp exposure
    // as sim_cosine_topk).
    "sim_hardneg" -> Q(
      """WITH p AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    CAST(ROUND(list_cosine_similarity(a.embedding, b.embedding), 4)
        |         AS DECIMAL(18,4)) AS sim
        |  FROM read_parquet('{sfDir}/embeddings.parquet') a
        |  JOIN read_parquet('{sfDir}/embeddings.parquet') b
        |    ON a.vec_id < 8 AND b.label <> a.label)
        |SELECT qid, nid, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |    ORDER BY sim DESC, nid) AS rn FROM p) t
        |WHERE rn <= 5 ORDER BY qid, nid""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val e = T.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qv"))
      val corpus = e.select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("embedding").as("nv"))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      corpus.join(broadcast(qs), col("nlabel") =!= col("qlabel"))
        .select(col("qid"), col("nid"),
          round(org.apache.spark.sql.graft.native
            .cosine_similarity(col("qv"), col("nv")), 4)
            .cast(DecimalType(18, 4)).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("qid", "nid", "sim")
        .orderBy("qid", "nid")
    },

    // ROBUST OUTLIERS (median absolute deviation) — the z-score's
    // (ts_outlier) robust twin: a 2σ gate is itself dragged by the
    // outliers it hunts; med ± 3.5·MAD is not. Everything is EXACT
    // despite the order statistics: values are floor-scaled to BIGINT
    // identically on both engines (floor has no tie semantics; Spark's
    // bare double→int cast truncates while DuckDB's rounds, so the
    // explicit floor is load-bearing), medians of integers interpolate
    // to exact halves, deviations are exact quarter-grained doubles,
    // and 3.5·MAD stays well inside the 2^53 mantissa — so the
    // threshold compare cannot flip across engines. Shape: the
    // ≤20-row med/mad frames BROADCAST back onto the fact (explicit —
    // left to statistics, Spark broadcasts the tiny fixture FACT
    // instead, and at scale a shuffle join on a 20-value key would
    // funnel everything through 20 reducers), so the fact is never
    // key-shuffled; the only wide ops are the two percentile
    // aggregates, whose partial buffers hold per-group value counts —
    // the honest cost of EXACT medians (at 100 TB a production gate
    // would swap in approx_percentile and keep the identical shape).
    "ts_outlier_mad" -> Q(
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value * 1000000) AS BIGINT) AS v
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |m1 AS (SELECT event_type, median(v) AS med FROM e GROUP BY 1),
        |e2 AS (SELECT e.event_type, e.v, m1.med, abs(e.v - m1.med) AS dev
        |       FROM e JOIN m1 USING (event_type)),
        |m2 AS (SELECT event_type, median(dev) AS mad FROM e2 GROUP BY 1)
        |SELECT e2.event_type,
        |  CAST(any_value(e2.med) * 2 AS BIGINT) AS med_x2,
        |  CAST(any_value(m2.mad) * 4 AS BIGINT) AS mad_x4,
        |  CAST(sum(CASE WHEN e2.dev > 3.5 * m2.mad THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_out,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM e2 JOIN m2 USING (event_type)
        |GROUP BY e2.event_type ORDER BY e2.event_type""".stripMargin) {
      (s, d) =>
        val e = T.events(s, d).select(col("event_type"),
          floor(col("value") * 1000000).cast("bigint").as("v"))
        val m1 = e.groupBy("event_type")
          .agg(expr("percentile(v, 0.5)").as("med"))
        val e2 = e.join(broadcast(m1), "event_type")
          .withColumn("dev", abs(col("v") - col("med")))
        val m2 = e2.groupBy("event_type")
          .agg(expr("percentile(dev, 0.5)").as("mad"))
        e2.join(broadcast(m2), "event_type")
          .groupBy("event_type")
          .agg((first(col("med")) * 2).cast("bigint").as("med_x2"),
            (first(col("mad")) * 4).cast("bigint").as("mad_x4"),
            sum(when(col("dev") > lit(3.5) * col("mad"), 1L).otherwise(0L))
              .as("n_out"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
    },

    // SLIDING-WINDOW DISTINCT — distinct users per trailing 7-day
    // window, the classic "rolling DAU/WAU" op that frame-based windows
    // cannot express (COUNT(DISTINCT) is not frame-incremental; the
    // cumulative form is win_count_distinct's first-occurrence trick —
    // this is the HARDER sliding form, where users expire). Scale
    // shape: each event fans out map-side to the ≤7 window-end days it
    // contributes to (bounded ×7, no self-join of the fact against a
    // date spine), a broadcast semi-join against the tiny actual-day
    // set drops phantom trailing days, and the one exchange is the
    // two-phase distinct aggregate on (day, user). The DuckDB oracle
    // runs the textbook day×events range join — quadratic in days,
    // exactly what the fan-out form avoids.
    "win_sliding_distinct" -> Q(
      """WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        |           FROM read_parquet('{sfDir}/events.parquet')),
        |days AS (SELECT DISTINCT day FROM e)
        |SELECT d.day AS day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS u7
        |FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day ORDER BY d.day""".stripMargin) { (s, d) =>
      val e = T.events(s, d)
        .select(to_date(col("ts_us")).as("day"), col("user_id"))
      val days = e.select("day").distinct()
      e.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
        .join(broadcast(days), Seq("day"), "left_semi")
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("u7"))
        .orderBy("day")
    },

    // SLIDING EXACT MEDIAN — the order-statistic window (p50 over the
    // trailing 4 rows per supplier): Spark's `percentile` aggregate
    // rides the window frame like any other aggregate; DuckDB's
    // `median` is the same quantile_cont(0.5). Over BIGINT inputs the
    // 0.5-interpolation is (lo+hi)/2 of exact integers — exact halves
    // in double on both engines, so no ulp exposure (the ADVICE-noted
    // interpolation-formula divergence only bites on fractional
    // quantiles of non-integers). The frame ordering includes qty so
    // sort ties can only swap rows with equal values — frame contents
    // are then invariant as multisets and the output is deterministic.
    "win_median" -> Q(
      """SELECT l_suppkey, l_orderkey, l_linenumber, qty,
        |  median(qty) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_orderkey, l_linenumber, qty
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS med
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
        |        CAST(floor(l_quantity) AS BIGINT) AS qty
        |      FROM read_parquet('{sfDir}/lineitem.parquet'))
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, qty""".stripMargin) {
      // floor BEFORE the BIGINT cast on both sides: the fixture's
      // quantities are integral today, but a bare double→int cast
      // truncates in Spark and ROUNDS in DuckDB — a fixture refresh
      // with fractional quantities would hash-diverge silently without
      // the explicit floor (the ts_outlier_mad discipline).
      (s, d) =>
        val w = Window.partitionBy("l_suppkey")
          .orderBy("l_orderkey", "l_linenumber", "qty")
          .rowsBetween(-3, Window.currentRow)
        T.lineitem(s, d)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            floor(col("l_quantity")).cast("bigint").as("qty"))
          .withColumn("med", expr("percentile(qty, 0.5)").over(w))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "qty")
    }
  )
}
