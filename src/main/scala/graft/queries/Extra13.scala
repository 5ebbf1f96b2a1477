package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Round-10 additions, part 3. Exact bitmap set-algebra BETWEEN cohorts
  * (the intersect complement to Extra12's agg_bitmap_distinct rollup),
  * Hilbert-curve clustering as the locality upgrade over the declared
  * Z-order layout, Spark 4 surface rows (collation-aware matching, the
  * built-in XML source round trip), regression aggregates from exact
  * mergeable power sums, three more classic TPC-H planner shapes (Q4's
  * two-sided correlated EXISTS, Q10's aggregated top-20, Q19's
  * disjunctive cross-side predicate pushdown), and the flow domain's
  * peer-scan detector.
  */
object Extra13 {

  private def stage(d: String, what: String): String =
    Q.stageDir("graft_evo", d, what)

  val defs: Map[String, Q] = Map(

    // XML source round trip — Spark 4's built-in XML reader/writer (the
    // spark-xml donation), completing the format family next to
    // csv/json/orc/avro/text: stage customers as <customer> row
    // elements, read back with an EXPLICIT schema (inference on XML
    // text is the classic silent-coercion trap — a bigint column that
    // infers long today infers double the day one value gains a
    // decimal point; the explicit schema turns drift into a loud
    // error), aggregate per segment. Oracle computes the same rollup
    // from the parquet original, so any value lost or re-typed in the
    // XML round trip hash-fails. Long/string columns only: XML carries
    // no float width, and doubles would round-trip through decimal
    // text (the scan_csv lesson applies unchanged).
    "scan_xml" -> Q(
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(c_custkey) AS BIGINT) AS sum_key
        |FROM read_parquet('{sfDir}/customer.parquet')
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val dir = stage(d, "xml")
      T.customer(s, d).select("c_custkey", "c_name", "c_mktsegment")
        .write.mode("overwrite")
        .option("rootTag", "customers").option("rowTag", "customer")
        .format("xml").save(dir)
      s.read
        .schema("c_custkey BIGINT, c_name STRING, c_mktsegment STRING")
        .option("rowTag", "customer").format("xml").load(dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("sum_key"))
        .orderBy("c_mktsegment")
    },

    // Exact COHORT OVERLAP via bitmap set algebra — the question every
    // retention/repeat-buyer dashboard asks ("how many of last year's
    // buyers bought again this year?"), answered EXACTLY and mergeably.
    // Spark 3.5's bitmap_* family has or_agg but no bitmap_and, so the
    // intersection comes from per-page inclusion-exclusion, which stays
    // exact because pages are exact: for each (segment, 32k-id bucket),
    // |A∩B| = |A| + |B| − |A∪B| with all three popcounts computed on
    // that bucket's pages (A/B = the two years' pages, U = their
    // bitmap_or_agg). Summing per-bucket intersections per segment
    // gives the global exact overlap — the shuffle after the one
    // custkey-keyed fact join carries only fixed-width pages, never id
    // lists, and pages from any shard merge losslessly (the ClickHouse
    // groupBitmapAnd operating model). Oracle: plain INTERSECT of the
    // two cohort key sets — any page bit lost or double-set hash-fails.
    "agg_bitmap_intersect" -> Q(
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_both FROM (
        |  SELECT c.c_mktsegment, o.o_custkey
        |  FROM read_parquet('{sfDir}/orders.parquet') o
        |  JOIN read_parquet('{sfDir}/customer.parquet') c ON o.o_custkey = c.c_custkey
        |  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        |  INTERSECT
        |  SELECT c.c_mktsegment, o.o_custkey
        |  FROM read_parquet('{sfDir}/orders.parquet') o
        |  JOIN read_parquet('{sfDir}/customer.parquet') c ON o.o_custkey = c.c_custkey
        |  WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        |) GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val cohorts = T.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
        .select(col("o_custkey"),
          when(col("o_orderdate") < lit("1997-01-01").cast("timestamp"), 1996)
            .otherwise(1997).as("yr"))
      // one custkey-keyed shuffle join tags each order with its segment;
      // at 100 TB both sides are big, so no broadcast hint here — the
      // join IS the only id-carrying shuffle, everything after is pages.
      val tagged = cohorts
        .join(T.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("grp"), col("yr"),
          col("o_custkey").as("id"))
      // the oracle's INTERSECT emits NO row for a segment whose overlap
      // is empty (or whose buyers sit in one year only); the helper
      // emits n_both=0 — filter to match. Latent-divergence fix: every
      // fixture segment overlaps today, so this only bites on a refresh.
      bitmapIntersectOf(tagged, 1996, 1997)
        .filter(col("n_both") > 0)
        .select(col("grp").as("c_mktsegment"), col("n_both"))
        .orderBy("c_mktsegment")
    },

    // HILBERT-curve layout — same bucket-quality probe as layout_zorder
    // (identical 16-bit normalization and bucket arithmetic, so the two
    // rows are directly comparable on the same data), but on the curve
    // with strictly better locality: consecutive Hilbert indexes are
    // always grid-adjacent (HilbertSpec pins the unit-step property),
    // so each key-range file covers a tighter 2-D box than Morton's
    // boundary jumps allow — fewer files touched per 2-D box predicate,
    // which is why Delta's OPTIMIZE moved from Z-order to Hilbert. The
    // transform is a native codegen'd expression (functions/HilbertIndex
    // — one generated loop; the equivalent unrolled-projection form
    // measured 4.9 s vs this form's 0.56 s because ~50 chained Projects
    // make plan ANALYSIS the cost, spec-pinned equal); the oracle replays the SAME
    // recurrence as a DuckDB recursive CTE, so every reflect/transpose
    // step is hash-gated, not just the final histogram shape.
    "layout_hilbert" -> Q(
      """WITH RECURSIVE s0 AS (
        |  SELECT l_partkey AS x, l_suppkey AS y
        |  FROM read_parquet('{sfDir}/lineitem.parquet')),
        |b AS (SELECT CAST(min(x) AS BIGINT) AS minx, CAST(max(x) AS BIGINT) AS maxx,
        |             CAST(min(y) AS BIGINT) AS miny, CAST(max(y) AS BIGINT) AS maxy
        |      FROM s0),
        |n AS (SELECT x, y,
        |        ((x - minx) * 65535) // greatest(maxx - minx, 1) AS hx,
        |        ((y - miny) * 65535) // greatest(maxy - miny, 1) AS hy
        |      FROM s0, b),
        |h AS (
        |  SELECT x, y, hx, hy, 16 AS i, CAST(0 AS BIGINT) AS d FROM n
        |  UNION ALL
        |  SELECT x, y,
        |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN m - yl ELSE yl END
        |         ELSE xl END AS hx,
        |    CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN m - xl ELSE xl END
        |         ELSE yl END AS hy,
        |    i - 1 AS i,
        |    d + (xor(3 * rx, ry) << (2 * (i - 1))) AS d
        |  FROM (
        |    SELECT x, y, hx, hy, i, d,
        |      (hx >> (i - 1)) & 1 AS rx,
        |      (hy >> (i - 1)) & 1 AS ry,
        |      (CAST(1 AS BIGINT) << (i - 1)) - 1 AS m,
        |      hx & ((CAST(1 AS BIGINT) << (i - 1)) - 1) AS xl,
        |      hy & ((CAST(1 AS BIGINT) << (i - 1)) - 1) AS yl
        |    FROM h WHERE i > 0))
        |SELECT d >> 27 AS h_bucket, CAST(count(*) AS BIGINT) AS n_rows,
        |       min(x) AS min_x, max(x) AS max_x,
        |       min(y) AS min_y, max(y) AS max_y,
        |       max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
        |FROM h WHERE i = 0 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val li = T.lineitem(s, d)
        .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
      graft.ops.Hilbert.withHKey(li, "x", "y")
        .groupBy(shiftright(col("hkey"), 27).as("h_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .withColumn("x_span", col("max_x") - col("min_x"))
        .withColumn("y_span", col("max_y") - col("min_y"))
        .orderBy("h_bucket")
    },

    // TPC-H Q4 (order-priority checking), adapted to the fixture's
    // columns (no commitdate/receiptdate: "a late line" is l_shipdate >
    // o_orderdate + 30 days): count orders per priority that HAVE at
    // least one late line, over one quarter. The planning shape this
    // adds over join_semi/subq_correlated: an EXISTS against the FACT
    // table where the correlated predicate references BOTH sides
    // (l_shipdate > o_orderdate + 30), so the decorrelated semi join
    // carries a non-equi residual on top of the orderkey equi-key —
    // Catalyst must keep it a hash semi join with the residual as a
    // join condition, never a nested loop. The oracle keeps the
    // textbook correlated EXISTS form.
    "sql_q4" -> Q(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM read_parquet('{sfDir}/orders.parquet') o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o.o_orderdate <  TIMESTAMP '1996-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM read_parquet('{sfDir}/lineitem.parquet') l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // Round-14: the semi join serves from the staged bucketed layout
      // (both sides arrive HashPartitioning(orderkey, 8) — the
      // non-equi lateness residual rides the co-located join).
      // Measured (Q14Probe, alternated ×3, min): 0.53 → 0.16 s at
      // sf0.1 — the band's largest cut: the semi join was ALL this
      // query's work, and co-location deletes both its exchanges.
      val (to, tl) = Extra10.bucketedTables(s, d)
      q4Of(s.table(tl), s.table(to).hint("merge"))
    },

    // TPC-H Q10 (returned-item reporting): which customers returned the
    // most revenue in a quarter — fact⋈fact (lineitem⋈orders on
    // orderkey, both date/flag-filtered BEFORE the join), then the
    // customer/nation dims, then a top-20 by aggregated revenue. The
    // planning shape this adds: an aggregate whose group key is a
    // MULTI-COLUMN dim tuple (custkey, name, acctbal, nation) — the
    // engine groups by the narrow key and carries the functionally-
    // dependent dim columns via first()-free grouping (they ride the
    // group key), and the final cut is TakeOrderedAndProject on the
    // AGGREGATED value with a unique tie-break (revenue DESC, custkey)
    // so the limit is deterministic on both engines.
    "sql_q10" -> Q(
      """SELECT c.c_custkey, c.c_name,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue,
        |  CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal, n.n_name
        |FROM read_parquet('{sfDir}/customer.parquet') c
        |JOIN read_parquet('{sfDir}/orders.parquet') o ON c.c_custkey = o.o_custkey
        |JOIN read_parquet('{sfDir}/lineitem.parquet') l ON l.l_orderkey = o.o_orderkey
        |JOIN read_parquet('{sfDir}/nation.parquet') n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        |  AND l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, acctbal, n.n_name
        |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val rev = graft.Q.dec2(col("l_extendedprice")) *
        (lit(1) - graft.Q.dec2(col("l_discount")))
      val o = T.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
                col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = T.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .withColumn("acctbal", graft.Q.dec2(col("c_acctbal")).cast("double"))
        .groupBy("c_custkey", "c_name", "acctbal", "n_name")
        .agg(graft.Q.dec4(sum(rev)).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q19 (discounted revenue under DISJUNCTIVE predicates): an
    // OR of per-branch conjunctions each referencing BOTH join sides
    // (brand/size from part, quantity from lineitem). The planner test:
    // the p_partkey equi-key must survive planning (hash join, OR as
    // residual), and Catalyst's extractPredicatesWithinOutputSet pushes
    // the DERIVED single-side disjunction ((brand A AND size…) OR
    // (brand B AND size…) OR …) down to the part scan, so the build
    // side is pre-filtered even though no single conjunct applies to
    // every branch — the classic OR-pushdown shape naive planners scan
    // full tables for.
    "sql_q19" -> Q(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM read_parquet('{sfDir}/lineitem.parquet') l
        |JOIN read_parquet('{sfDir}/part.parquet') p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 20)
        |   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 30
        |       AND l.l_quantity BETWEEN 5 AND 30)
        |   OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 20 AND 50
        |       AND l.l_quantity BETWEEN 10 AND 40)""".stripMargin) { (s, d) =>
      val rev = graft.Q.dec2(col("l_extendedprice")) *
        (lit(1) - graft.Q.dec2(col("l_discount")))
      def branch(brand: String, s0: Int, s1: Int, q0: Int, q1: Int) =
        col("p_brand") === brand &&
          col("p_size").between(s0, s1) && col("l_quantity").between(q0, q1)
      T.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(T.part(s, d).select("p_partkey", "p_brand", "p_size"),
          col("p_partkey") === col("l_partkey"))
        .filter(branch("Brand#13", 1, 15, 1, 20) ||
                branch("Brand#20", 10, 30, 5, 30) ||
                branch("Brand#9", 20, 50, 10, 40))
        .agg(graft.Q.dec4(sum(rev)).as("revenue"),
          count(lit(1)).as("n"))
    },

    // REGRESSION aggregates (the regr_slope / regr_intercept / regr_r2
    // family) from exact decimal power sums — the same closed forms the
    // built-ins compute, but from order-independent mergeable sums (the
    // agg_corr / agg_stddev discipline), so partial aggregates combine
    // across any shard topology and the result is bit-deterministic —
    // the built-ins' streaming-covariance accumulators are
    // order-sensitive in the last ulps AND differ between engines, so
    // they could never be hash-gated (QueriesSpec pins the built-in
    // agrees with the exact form to 1e-6, which is the gate the
    // built-ins themselves can get). Final arithmetic is the identical
    // double expression on both sides, sub-expression by
    // sub-expression: num/dx/dy go to DOUBLE individually (their
    // decimal products overflow DECIMAL(38) at larger SFs).
    "agg_regression" -> Q(
      """WITH s AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM read_parquet('{sfDir}/lineitem.parquet') GROUP BY l_returnflag),
        |t AS (
        |  SELECT l_returnflag, n,
        |    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS dy,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM s)
        |SELECT l_returnflag, n,
        |  CAST(ROUND(num / dx, 6) AS DECIMAL(18,6)) AS slope,
        |  CAST(ROUND((syd - (num / dx) * sxd) / n, 6) AS DECIMAL(18,6)) AS icept,
        |  CAST(ROUND((num * num) / (dx * dy), 6) AS DECIMAL(18,6)) AS r2
        |FROM t ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val x = graft.Q.dec2(col("l_quantity"))
      val y = graft.Q.dec2(col("l_extendedprice"))
      T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
        .withColumn("num", (col("n") * col("sxy") - col("sx") * col("sy")).cast("double"))
        .withColumn("dx", (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .withColumn("dy", (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
        .withColumn("sxd", col("sx").cast("double"))
        .withColumn("syd", col("sy").cast("double"))
        .select(col("l_returnflag"), col("n"),
          graft.Q.dec6(round(col("num") / col("dx"), 6)).as("slope"),
          graft.Q.dec6(round((col("syd") - (col("num") / col("dx")) * col("sxd"))
            / col("n"), 6)).as("icept"),
          graft.Q.dec6(round((col("num") * col("num")) / (col("dx") * col("dy")), 6))
            .as("r2"))
        .orderBy("l_returnflag")
    },

    // SCAN DETECTION — the flow domain's canonical security rollup
    // (every NetFlow backend's second dashboard query, after top
    // talkers): which sources fan out to the most DISTINCT peers per
    // day. Same deterministic events→flow mapping as flow_top_talkers
    // (the oracle may only read fixture paths), day buckets via the
    // stream_tumbling epoch idiom. The distinct count is written as the
    // EXPLICIT two-phase form — dedupe (src, day, dst) with map-side
    // partial counts, then rollup n_dst = count, n_flows = sum — so
    // the shuffle carries each distinct peer once, never raw flows;
    // suspects surface via TakeOrderedAndProject with a unique
    // tie-break. At 100 TB the exact per-key distinct swaps for the
    // mergeable sketch/bitmap rows (agg_sketch_merge /
    // agg_bitmap_distinct) — the rollup shape is unchanged.
    "flow_scan_detect" -> Q(
      """WITH h0 AS (
        |  SELECT ((user_id % 2147483647) * 2654435761) % 16777216 AS h,
        |         event_id, ts
        |  FROM read_parquet('{sfDir}/events.parquet')
        |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
        |f AS (
        |  SELECT concat('10.', CAST((h // 65536) % 256 AS VARCHAR), '.',
        |                CAST((h // 256) % 256 AS VARCHAR), '.',
        |                CAST(h % 256 AS VARCHAR)) AS src_addr,
        |         concat('172.16.', CAST((event_id // 256) % 256 AS VARCHAR), '.',
        |                CAST(event_id % 256 AS VARCHAR)) AS dst_addr,
        |         (CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) * 86400 AS day_s
        |  FROM h0)
        |SELECT src_addr, day_s,
        |       CAST(count(DISTINCT dst_addr) AS BIGINT) AS n_dst,
        |       CAST(count(*) AS BIGINT) AS n_flows
        |FROM f GROUP BY src_addr, day_s
        |ORDER BY n_dst DESC, src_addr, day_s LIMIT 10""".stripMargin) { (s, d) =>
      val flows = Extra12.withFlowAddrs(T.events(s, d))
        .select(col("src_addr"), col("dst_addr"),
          (expr("unix_timestamp(ts_us) div 86400") * 86400).as("day_s"))
      flows
        .groupBy("src_addr", "day_s", "dst_addr")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("src_addr", "day_s")
        .agg(count(lit(1)).as("n_dst"), sum("cnt").as("n_flows"))
        .orderBy(col("n_dst").desc, col("src_addr"), col("day_s"))
        .limit(10)
    },

    // Spark 4 COLLATION-aware matching (the GA'd collation surface,
    // sibling to fn_variant's VARIANT row): equality under UTF8_LCASE
    // matches case-insensitively WITHOUT rewriting the data — the
    // mixed-case probes below match the fixture's lowercase event types
    // only because the comparison itself is collated (under the default
    // binary collation every probe matches zero rows). The oracle
    // replays with lower()=lower(), the pre-collation idiom this
    // feature replaces. Probes ride a broadcast; the collated equality
    // stays a hash-join key (collation support lowers to a
    // collation-key hash, not a filter).
    "fn_collation" -> Q(
      """SELECT probe, CAST(count(*) AS BIGINT) AS n
        |FROM (VALUES ('CLICK'), ('Purchase'), ('ERROR')) p(probe)
        |JOIN read_parquet('{sfDir}/events.parquet') e
        |  ON lower(e.event_type) = lower(p.probe)
        |GROUP BY probe ORDER BY probe""".stripMargin) { (s, d) =>
      import s.implicits._
      val probes = Seq("CLICK", "Purchase", "ERROR").toDF("probe")
      T.events(s, d)
        .join(broadcast(probes),
          expr("collate(event_type, 'UTF8_LCASE')") ===
            expr("collate(probe, 'UTF8_LCASE')"))
        .groupBy("probe")
        .agg(count(lit(1)).as("n"))
        .orderBy("probe")
    }
  )

  /** The agg_bitmap_intersect page pipeline over an explicit
    * (grp, yr, id) frame — the declared query binds the fixture; the
    * spec binds seeded frames whose ids SPAN bitmap buckets (the
    * winCountDistinctOf convention). The fixture alone cannot exercise
    * the multi-bucket path: custkeys top out at 15k < 32768, one
    * bucket — a bug that mixed pages across buckets, or mis-handled
    * the exact 32768/32769 boundary, would still pass the oracle.
    *
    * Per (grp, bucket): |A∩B| = |A| + |B| − |A∪B| over that bucket's
    * exact pages — exact because pages are exact; summed per grp.
    * Duplicate ids per side are absorbed by bitmap_construct_agg
    * (sets a bit, never counts it twice).
    */
  private[graft] def bitmapIntersectOf(tagged: org.apache.spark.sql.DataFrame,
      yrA: Int, yrB: Int): org.apache.spark.sql.DataFrame =
    // inclusion-exclusion is only sound over EXACTLY the two cohorts: a
    // foreign yr's page would join the OR-merge (inflating n_u) without
    // entering n_a/n_b, driving the bucket's count negative — filter
    // rather than trust the caller's frame.
    tagged
      .filter(col("yr").isin(yrA, yrB))
      .groupBy(col("grp"), col("yr"),
        expr("bitmap_bucket_number(id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(id))").as("page"))
      .groupBy("grp", "bucket")
      .agg(
        sum(when(col("yr") === yrA, expr("bitmap_count(page)"))
          .otherwise(0L)).as("n_a"),
        sum(when(col("yr") === yrB, expr("bitmap_count(page)"))
          .otherwise(0L)).as("n_b"),
        expr("bitmap_count(bitmap_or_agg(page))").as("n_u"))
      .groupBy("grp")
      .agg(sum(col("n_a") + col("n_b") - col("n_u")).as("n_both"))

  /** Q4's body over explicit fact frames — the declared query binds the
    * bucketed tables (the Extra12.q5Of convention).
    */
  private[graft] def q4Of(l0: org.apache.spark.sql.DataFrame,
      o0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val o = o0
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-10-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = l0.select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }
}
