package graft.queries

import graft.{Q, Tables => T}
import graft.Q.dec2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

/** Round-10 additions, part 8: the remaining language/semantics rows a
  * reference user would still reach for — SQL-level RECURSION (Spark 4's
  * UnionLoop operator, the one relational control-flow construct nothing
  * else on the board exercises), the two classic inference tests every
  * experimentation pipeline runs (Welch t, chi-squared independence),
  * RADIUS similarity search (the third search mode next to top-k pairs
  * and query→corpus top-k), NULL-SAFE join equality, and the outer
  * generator family (explode_outer / posexplode_outer's null-row
  * semantics, which the inner explode rows can't show).
  */
object Extra18 {

  val defs: Map[String, Q] = Map(

    // RECURSIVE CTE — Spark 4's WITH RECURSIVE (UnionLoop / UnionLoopRef
    // plan nodes): an iterative fixpoint INSIDE one SQL statement, the
    // construct hierarchies/BOM/reachability queries need and the one
    // the DataFrame-side loops (PageRank, Components) hand-roll. The
    // hierarchy is a parent-pointer binary tree over the dense customer
    // keys (parent(k) = k DIV 32 — FIXTURES pins density 0..N-1), walked
    // root-down with depth, then rolled up per level (32-ary, not binary:
    // each recursive step is a full frontier-against-base shuffle join
    // and a driver-side iteration barrier, so tree ARITY is the lever —
    // log32 levels cost ~3x less wall-clock than log2 for the same node
    // count (measured 2.15s binary / 1.32 8-ary / 0.97 32-ary at sf0.1), the same reason production hierarchy walks batch levels;
    // r13 floor note: at 32-ary the remaining ~1 s is the per-level
    // driver barrier × ⌈log32 N⌉ levels plus the final rollup — the
    // arity lever is spent, and pushing arity further only shifts work
    // into a wider per-level join for the same barrier count). Spark executes
    // each recursive step as a distributed join of the frontier against
    // the base relation (UNION ALL semantics only — the probe-verified
    // 4.1.2 surface; UNION-distinct recursion is unsupported), so the
    // level-by-level work is exactly the BFS shape that scales: frontier
    // × base equi-join per iteration, ~log2(N) iterations for a tree.
    // DuckDB runs the identical recursion natively.
    "sql_recursive" -> Q(
      """WITH RECURSIVE t AS (
        |  SELECT c_custkey AS k, 0 AS depth, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM read_parquet('{sfDir}/customer.parquet') WHERE c_custkey = 0
        |  UNION ALL
        |  SELECT c.c_custkey AS k, t.depth + 1 AS depth, CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM read_parquet('{sfDir}/customer.parquet') c
        |  JOIN t ON c.c_custkey // 32 = t.k AND c.c_custkey > t.k)
        |SELECT depth, COUNT(*) AS n_nodes,
        |       CAST(MIN(k) AS BIGINT) AS min_key, CAST(MAX(k) AS BIGINT) AS max_key,
        |       CAST(SUM(bal) AS DECIMAL(18,4)) AS sum_bal
        |FROM t GROUP BY depth ORDER BY depth""".stripMargin) { (s, d) =>
      T.customer(s, d).createOrReplaceTempView("graft_rec_customer")
      // c_custkey > t.k is the structural cycle guard: node 0 is its own
      // parent under DIV 32, and UNION ALL recursion has no dedup to
      // break the resulting self-loop — heap children 32k+j (j=0..31) are
      // strictly greater for k >= 1, so the predicate costs nothing on real edges.
      s.sql(
        """WITH RECURSIVE t AS (
          |  SELECT c_custkey AS k, 0 AS depth, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
          |  FROM graft_rec_customer WHERE c_custkey = 0
          |  UNION ALL
          |  SELECT c.c_custkey AS k, t.depth + 1 AS depth, CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal
          |  FROM graft_rec_customer c JOIN t ON c.c_custkey DIV 32 = t.k AND c.c_custkey > t.k)
          |SELECT depth, COUNT(*) AS n_nodes, MIN(k) AS min_key, MAX(k) AS max_key,
          |       CAST(SUM(bal) AS DECIMAL(18,4)) AS sum_bal
          |FROM t GROUP BY depth ORDER BY depth""".stripMargin)
    },

    // WELCH'S T-TEST (unequal variances) between two event cohorts — the
    // A/B readout every experimentation pipeline computes. ONE scan, ONE
    // reduce: the six sufficient statistics (n, Σv, Σv²) per cohort fold
    // as conditional map-side partials (the dq_check shape), so the test
    // costs a single two-phase aggregate at any scale. Determinism
    // contract: the sums are EXACT decimals (dec2 before aggregation —
    // summation order can't change them); the mean/variance/t/dof math
    // then runs once on those exact scalars in doubles, mirrored
    // operation-for-operation in the oracle, so the IEEE results are
    // bit-identical before the final ROUND.
    "agg_ttest" -> Q(
      """WITH x AS (SELECT
        |  COUNT(*) FILTER (event_type = 'click') AS n1,
        |  SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'click') AS s1,
        |  SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'click') AS q1,
        |  COUNT(*) FILTER (event_type = 'view') AS n2,
        |  SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'view') AS s2,
        |  SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) FILTER (event_type = 'view') AS q2
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |y AS (SELECT n1, n2,
        |  CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
        |  (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1) AS v1,
        |  (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (n2 - 1) AS v2
        |  FROM x)
        |SELECT n1, n2,
        |  CAST(ROUND(m1, 6) AS DECIMAL(18,6)) AS mean_a,
        |  CAST(ROUND(m2, 6) AS DECIMAL(18,6)) AS mean_b,
        |  CAST(ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS DECIMAL(18,6)) AS t_stat,
        |  CAST(ROUND(POW(v1 / n1 + v2 / n2, 2) /
        |    (POW(v1 / n1, 2) / (n1 - 1) + POW(v2 / n2, 2) / (n2 - 1)), 4) AS DECIMAL(18,4)) AS dof
        |FROM y""".stripMargin) { (s, d) =>
      val e = T.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"), dec2(col("value")).as("v"))
      def cond(t: String, c: org.apache.spark.sql.Column) = sum(when(col("event_type") === t, c))
      val x = e.agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
        cond("click", col("v")).as("s1"),
        cond("click", col("v") * col("v")).as("q1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n2"),
        cond("view", col("v")).as("s2"),
        cond("view", col("v") * col("v")).as("q2"))
      val y = x.select(col("n1"), col("n2"),
        (col("s1").cast("double") / col("n1")).as("m1"),
        (col("s2").cast("double") / col("n2")).as("m2"),
        ((col("q1").cast("double") - col("s1").cast("double") * col("s1").cast("double") / col("n1")) / (col("n1") - 1)).as("v1"),
        ((col("q2").cast("double") - col("s2").cast("double") * col("s2").cast("double") / col("n2")) / (col("n2") - 1)).as("v2"))
      y.select(col("n1"), col("n2"),
        round(col("m1"), 6).cast(DecimalType(18, 6)).as("mean_a"),
        round(col("m2"), 6).cast(DecimalType(18, 6)).as("mean_b"),
        round((col("m1") - col("m2")) /
          sqrt(col("v1") / col("n1") + col("v2") / col("n2")), 6)
          .cast(DecimalType(18, 6)).as("t_stat"),
        round(pow(col("v1") / col("n1") + col("v2") / col("n2"), 2) /
          (pow(col("v1") / col("n1"), 2) / (col("n1") - 1) +
           pow(col("v2") / col("n2"), 2) / (col("n2") - 1)), 4)
          .cast(DecimalType(18, 4)).as("dof"))
    },

    // CHI-SQUARED INDEPENDENCE over the event_type × user-parity
    // contingency table — the categorical counterpart to agg_ttest. The
    // observed table is one keyed aggregate (|types|·|cohorts| cells);
    // marginals and the statistic are arithmetic over those ≤10 exact
    // integers, so the whole test is one shuffle however large the
    // event log. The only doubles are the final expected-count terms;
    // the 10-term sum is the one place summation order could bite, and
    // ROUND(,4) on a chi²≈O(10) value keeps the residual ulp risk in
    // the same accepted class as dq_check/agg_corr (ADVICE r9 note).
    "agg_chi2" -> Q(
      """WITH c AS (SELECT event_type, user_id % 2 AS cohort, COUNT(*) AS o
        |           FROM read_parquet('{sfDir}/events.parquet') GROUP BY 1, 2),
        |rt AS (SELECT event_type, SUM(o) AS r FROM c GROUP BY 1),
        |ct AS (SELECT cohort, SUM(o) AS cl FROM c GROUP BY 1),
        |n AS (SELECT SUM(o) AS nn FROM c)
        |SELECT CAST(ROUND(SUM(POW(o - r * cl / nn, 2) / (r * cl / nn)), 4) AS DECIMAL(18,4)) AS chi2,
        |       CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT cohort) - 1) AS INT) AS dof
        |FROM c JOIN rt USING (event_type) JOIN ct USING (cohort) CROSS JOIN n""".stripMargin) { (s, d) =>
      val cells = T.events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 2).as("cohort"))
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy("event_type").agg(sum("o").as("r"))
      val ct = cells.groupBy("cohort").agg(sum("o").as("cl"))
      val n = cells.agg(sum("o").as("nn"))
      cells.join(broadcast(rt), "event_type").join(broadcast(ct), "cohort")
        .crossJoin(broadcast(n))
        .agg(
          round(sum(pow(col("o") - col("r") * col("cl") / col("nn"), 2) /
            (col("r") * col("cl") / col("nn"))), 4)
            .cast(DecimalType(18, 4)).as("chi2"),
          ((countDistinct("event_type") - 1) * (countDistinct("cohort") - 1))
            .cast(IntegerType).as("dof"))
    },

    // RADIUS (range) similarity search — the third search mode next to
    // pair mining (sim_ann_lsh/ivf) and query→corpus top-k (sim_ann_pq/
    // ivfpq/maxsim): "every corpus vector within cosine ≥ τ of each
    // query". With a SMALL query set the scale shape IS the exact scan:
    // broadcast the queries, stream the corpus once map-side — linear,
    // no shuffle, no index, and (unlike LSH prefilters) exactly the
    // oracle's semantics, so the gate is an equality, not a recall
    // bound. When the query side grows past broadcast size the problem
    // becomes pair mining and the banded-LSH rows are the scale twin.
    "sim_range_search" -> Q(
      """SELECT a.vec_id AS qid, b.vec_id AS nid,
        |       CAST(ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) AS DECIMAL(18,4)) AS sim
        |FROM read_parquet('{sfDir}/embeddings.parquet') a
        |JOIN read_parquet('{sfDir}/embeddings.parquet') b
        |  ON a.vec_id < 8 AND b.vec_id <> a.vec_id
        |WHERE ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.2
        |ORDER BY qid, nid""".stripMargin) { (s, d) =>
      val e = T.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val corpus = e.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      corpus.join(broadcast(qs), col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          round(org.apache.spark.sql.graft.native.cosine_similarity(col("qv"), col("nv")), 4)
            .cast(DecimalType(18, 4)).as("sim"))
        .filter(col("sim") >= 0.2)
        .orderBy("qid", "nid")
    },

    // NULL-SAFE join equality (<=> / IS NOT DISTINCT FROM) — the join
    // semantic plain equality CANNOT express: NULL keys match EACH
    // OTHER instead of vanishing. Nulls are synthesized from DIFFERENT
    // values on each side (customers' nation 3, suppliers' nation 7),
    // so the null group pairs rows no ordinary equi-join would — the
    // unknown-bucket join of entity-resolution pipelines. Spark plans
    // <=> as a genuine equi-join key (hash/sort-merge on the null-safe
    // comparison), not a nested loop — the property that keeps it
    // usable at scale.
    "join_null_safe" -> Q(
      """SELECT c.k, COUNT(*) AS n_pairs FROM
        | (SELECT nullif(c_nationkey, 3) AS k FROM read_parquet('{sfDir}/customer.parquet')) c
        | JOIN (SELECT nullif(s_nationkey, 7) AS sk FROM read_parquet('{sfDir}/supplier.parquet')) s
        | ON c.k IS NOT DISTINCT FROM s.sk
        |GROUP BY c.k ORDER BY c.k NULLS FIRST""".stripMargin) { (s, d) =>
      val c = T.customer(s, d).select(expr("nullif(c_nationkey, 3)").as("k"))
      val sup = T.supplier(s, d).select(expr("nullif(s_nationkey, 7)").as("sk"))
      c.join(sup, col("k") <=> col("sk"))
        .groupBy("k").agg(count(lit(1)).as("n_pairs"))
        .orderBy(asc_nulls_first("k"))
    },

    // OUTER generator semantics — posexplode_outer: rows whose array is
    // EMPTY survive with NULL (pos, x) instead of disappearing, the
    // "keep the parent even when the child list is empty" contract that
    // inner explode (fn_array's scalar path, text explodes) never
    // exercises. The array length cycles 0..3 off the order key, so
    // every fourth order IS the empty case. DuckDB has no outer unnest:
    // the oracle reconstructs it as inner-unnest ∪ the empty-array rows
    // with typed NULLs. Generate is map-side narrow work — rows fan out
    // in place, no shuffle until the final sort.
    "fn_generator" -> Q(
      """WITH t AS (SELECT o_orderkey, ([10, 20, 30])[1:CAST(o_orderkey % 4 AS INT)] AS arr
        |           FROM read_parquet('{sfDir}/orders.parquet')),
        |ex AS (SELECT o_orderkey, arr, unnest(generate_series(1, len(arr))) AS i
        |       FROM t WHERE len(arr) > 0)
        |SELECT o_orderkey, CAST(i - 1 AS INT) AS pos, arr[CAST(i AS INT)] AS x FROM ex
        |UNION ALL
        |SELECT o_orderkey, CAST(NULL AS INT) AS pos, CAST(NULL AS INT) AS x
        |FROM t WHERE len(arr) = 0
        |ORDER BY o_orderkey, pos NULLS FIRST""".stripMargin) { (s, d) =>
      T.orders(s, d)
        .select(col("o_orderkey"),
          posexplode_outer(slice(array(lit(10), lit(20), lit(30)),
            lit(1), (col("o_orderkey") % 4).cast("int"))))
        .withColumnRenamed("col", "x")
        .orderBy(col("o_orderkey"), asc_nulls_first("pos"))
    }
  )
}
