package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Breadth beyond the core inventory: exact-arithmetic stddev, listagg,
  * pivot/unpivot, scalar + correlated subqueries, first/last/nth window
  * values, RANGE frames, higher-order array functions, bitwise ops.
  */
object Extra {

  val defs: Map[String, Q] = Map(

    "set_intersect_all" -> Q(
      """SELECT c_nationkey AS k FROM read_parquet('{sfDir}/customer.parquet')
        |INTERSECT ALL
        |SELECT s_nationkey AS k FROM read_parquet('{sfDir}/supplier.parquet')
        |ORDER BY k""".stripMargin) {
      // Bag semantics: multiplicity = min(left, right) per value.
      (s, d) => T.customer(s, d).select(col("c_nationkey").as("k"))
        .intersectAll(T.supplier(s, d).select(col("s_nationkey").as("k")))
        .orderBy("k")
    },

    "set_except_all" -> Q(
      """SELECT s_nationkey AS k FROM read_parquet('{sfDir}/supplier.parquet')
        |EXCEPT ALL
        |SELECT n_nationkey AS k FROM read_parquet('{sfDir}/nation.parquet')
        |ORDER BY k""".stripMargin) {
      // Bag semantics: multiplicity = max(left - right, 0) per value.
      (s, d) => T.supplier(s, d).select(col("s_nationkey").as("k"))
        .exceptAll(T.nation(s, d).select(col("n_nationkey").as("k")))
        .orderBy("k")
    },

    "win_pct" -> Q(
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROUND(PERCENT_RANK() OVER w, 6) AS DECIMAL(18,6)) AS pr,
        |  CAST(ROUND(CUME_DIST() OVER w, 6) AS DECIMAL(18,6)) AS cd
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        T.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            round(percent_rank().over(w), 6).cast(DecimalType(18, 6)).as("pr"),
            round(cume_dist().over(w), 6).cast(DecimalType(18, 6)).as("cd"))
          .orderBy("o_custkey", "o_orderkey")
    },

    "join_lateral" -> Q(
      """SELECT n.n_nationkey, n.n_name, top.c_custkey, top.bal
        |FROM read_parquet('{sfDir}/nation.parquet') n,
        |LATERAL (SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |         FROM read_parquet('{sfDir}/customer.parquet') c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) top
        |ORDER BY n_nationkey""".stripMargin) {
      // Correlated LATERAL top-1 per key — Catalyst plans it via
      // DomainJoin/decorrelation rules.
      (s, d) =>
        T.nation(s, d).createOrReplaceTempView("nat_lat")
        T.customer(s, d).createOrReplaceTempView("cust_lat")
        s.sql(
          """SELECT n.n_nationkey, n.n_name, top.c_custkey, top.bal
            |FROM nat_lat n,
            |LATERAL (SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
            |         FROM cust_lat c
            |         WHERE c.c_nationkey = n.n_nationkey
            |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) top
            |ORDER BY n_nationkey""".stripMargin)
    },

    "agg_stddev" -> Q(
      // Variance from exact decimal power sums: numerator exact, single
      // double division at the end — engine-independent.
      // The second moment is emitted in MILLIONS (exact decimal scale
      // shift ×0.000001, then exact ROUND): the raw sum of squares has an
      // unscaled value > 2^53 already at sf0.01, where decimal→double
      // conversion stops being bit-identical across engines (Spark rounds
      // the exact value once; DuckDB's pandas path converts the unscaled
      // int128 first). Keeping the emitted magnitude small keeps the final
      // DOUBLE bit-stable through sf10+.
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_x,
        |  CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,4))
        |        * CAST(0.000001 AS DECIMAL(8,6)), 4) AS DECIMAL(18,4)) AS sum_x2_mio,
        |  CAST(ROUND(sqrt(CAST(COUNT(*) * SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)))
        |        - SUM(CAST(o_totalprice AS DECIMAL(18,2))) * SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / (COUNT(*) * (COUNT(*) - 1))), 2) AS DECIMAL(18,2)) AS stddev
        |FROM read_parquet('{sfDir}/orders.parquet')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        val x = dec2(col("o_totalprice"))
        val mio = lit(new java.math.BigDecimal("0.000001")).cast(DecimalType(8, 6))
        T.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            dec2(sum(x)).as("sum_x"),
            // Narrow the second moment to DECIMAL(28,4) BEFORE the ×10⁻⁶
            // shift: sum(x·x) is DECIMAL(38,4), and 38,4 × 8,6 overflows
            // precision 38, silently rounding to scale 6 before the
            // explicit round (double rounding, and a different numeric
            // path than DuckDB's >38-wide multiply). 28+8+1 = 37 ≤ 38, so
            // both engines compute the exact scale-10 product and round
            // once. The cast is safe: the moment in millions stays far
            // below 10²⁴ at any SF this library targets.
            round(sum(x * x).cast(DecimalType(28, 4)) * mio, 4)
              .cast(DecimalType(18, 4)).as("sum_x2_mio"),
            round(sqrt((count(lit(1)) * sum(x * x) - sum(x) * sum(x)).cast("double")
              / (count(lit(1)) * (count(lit(1)) - 1))), 2)
              .cast(DecimalType(18, 2)).as("stddev"))
          .orderBy("o_orderpriority")
    },

    "agg_median" -> Q(
      // Discrete order statistics (lower median, ceil-rank p90): engines
      // disagree on continuous-quantile interpolation arithmetic at the
      // last ulp, so the declared form picks actual data values — exact
      // decimals, no interpolation.
      """WITH t AS (
        |  SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS x,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |  FROM read_parquet('{sfDir}/orders.parquet'))
        |SELECT o_orderpriority,
        |  MAX(CASE WHEN rn = (cnt + 1) // 2 THEN x END) AS med_lo,
        |  MAX(CASE WHEN rn = (9 * cnt + 9) // 10 THEN x END) AS p90_disc
        |FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wc = Window.partitionBy("o_orderpriority")
        T.orders(s, d)
          .select(col("o_orderpriority"), dec2(col("o_totalprice")).as("x"),
            row_number().over(w).as("rn"),
            count(lit(1)).over(wc).as("cnt"))
          .groupBy("o_orderpriority")
          .agg(
            max(when(col("rn") === expr("(cnt + 1) div 2"), col("x"))).as("med_lo"),
            max(when(col("rn") === expr("(9 * cnt + 9) div 10"), col("x"))).as("p90_disc"))
          .orderBy("o_orderpriority")
    },

    "agg_corr" -> Q(
      // Pearson r from exact decimal power sums (same discipline as
      // agg_stddev): numerator/denominator exact until two trailing
      // double ops.
      """WITH s AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM read_parquet('{sfDir}/lineitem.parquet') GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS DECIMAL(18,6)) AS r
        |FROM s ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        val x = dec2(col("l_quantity"))
        val y = dec2(col("l_extendedprice"))
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
            sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
          .select(col("l_returnflag"), col("n"),
            // factors go to DOUBLE individually: their decimal product
            // overflows DECIMAL(38) at larger scale factors
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
                * (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
              .cast(DecimalType(18, 6)).as("r"))
          .orderBy("l_returnflag")
    },

    "fn_datefmt" -> Q(
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  strftime(o_orderdate, '%Y/%m/%d') AS ymd,
        |  strftime(o_orderdate, '%j') AS doy
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) => T.orders(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        date_format(col("o_orderdate"), "yyyy/MM/dd").as("ymd"),
        date_format(col("o_orderdate"), "DDD").as("doy"))
        .orderBy("o_orderkey")
    },

    "agg_listagg" -> Q(
      """SELECT c_nationkey,
        |       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs
        |FROM read_parquet('{sfDir}/customer.parquet')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) {
      (s, d) => T.customer(s, d)
        .groupBy("c_nationkey")
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segs"))
        .orderBy("c_nationkey")
    },

    "agg_pivot" -> Q(
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pend
        |FROM read_parquet('{sfDir}/orders.parquet')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) => T.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("O"), lit(0L)).as("n_open"),
          coalesce(col("F"), lit(0L)).as("n_done"),
          coalesce(col("P"), lit(0L)).as("n_pend"))
        .orderBy("o_orderpriority")
    },

    "agg_unpivot" -> Q(
      """SELECT o_orderpriority, status, n FROM (
        |  SELECT o_orderpriority, 'O' AS status, COUNT(*) FILTER (WHERE o_orderstatus='O') AS n
        |  FROM read_parquet('{sfDir}/orders.parquet') GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT o_orderpriority, 'F', COUNT(*) FILTER (WHERE o_orderstatus='F')
        |  FROM read_parquet('{sfDir}/orders.parquet') GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT o_orderpriority, 'P', COUNT(*) FILTER (WHERE o_orderstatus='P')
        |  FROM read_parquet('{sfDir}/orders.parquet') GROUP BY o_orderpriority) t
        |ORDER BY o_orderpriority, status""".stripMargin) {
      // Spark side: pivot then stack() back — the unpivot/UDTF path.
      (s, d) => T.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .count()
        .select(col("o_orderpriority"),
          expr("stack(3, 'O', coalesce(O, 0L), 'F', coalesce(F, 0L), 'P', coalesce(P, 0L)) AS (status, n)"))
        .orderBy("o_orderpriority", "status")
    },

    "subq_scalar" -> Q(
      """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
        |  (SELECT CAST(ROUND(AVG(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) * 1.8
        |   FROM read_parquet('{sfDir}/orders.parquet'))
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        T.orders(s, d).createOrReplaceTempView("ord_sq")
        s.sql(
          """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
            |FROM ord_sq
            |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
            |  (SELECT CAST(ROUND(AVG(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) * 1.8
            |   FROM ord_sq)
            |ORDER BY o_orderkey""".stripMargin)
    },

    "subq_correlated" -> Q(
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM read_parquet('{sfDir}/orders.parquet') o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) AS n_big
        |FROM read_parquet('{sfDir}/customer.parquet') c
        |WHERE c_custkey < 300
        |ORDER BY c_custkey""".stripMargin) {
      // Catalyst decorrelates this into an aggregate + left join (SURVEY §4).
      (s, d) =>
        T.orders(s, d).createOrReplaceTempView("ord_corr")
        T.customer(s, d).createOrReplaceTempView("cust_corr")
        s.sql(
          """SELECT c_custkey,
            |  (SELECT COUNT(*) FROM ord_corr o
            |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) AS n_big
            |FROM cust_corr c
            |WHERE c_custkey < 300
            |ORDER BY c_custkey""".stripMargin)
    },

    "win_first_last" -> Q(
      """SELECT o_custkey, o_orderkey,
        |  CAST(FIRST_VALUE(o_totalprice) OVER w AS DECIMAL(18,2)) AS first_price,
        |  CAST(LAST_VALUE(o_totalprice) OVER w AS DECIMAL(18,2)) AS last_price,
        |  CAST(NTH_VALUE(o_totalprice, 2) OVER w AS DECIMAL(18,2)) AS second_price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            dec2(first(col("o_totalprice")).over(w)).as("first_price"),
            dec2(last(col("o_totalprice")).over(w)).as("last_price"),
            dec2(nth_value(col("o_totalprice"), 2).over(w)).as("second_price"))
          .orderBy("o_custkey", "o_orderkey")
    },

    "win_range_frame" -> Q(
      """SELECT o_custkey, o_orderkey, d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY d
        |     RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS sum_7d
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS d
        |      FROM read_parquet('{sfDir}/orders.parquet')) t
        |ORDER BY o_custkey, o_orderkey, d""".stripMargin) {
      // RANGE frame over integer day offsets: peers (same day) always in
      // frame together — deterministic regardless of tie order.
      (s, d) =>
        val w = Window.partitionBy("o_custkey").orderBy(col("d"))
          .rangeBetween(-7, Window.currentRow)
        T.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("d"))
          .select(col("o_custkey"), col("o_orderkey"), col("d"),
            dec2(sum(dec2(col("o_totalprice"))).over(w)).as("sum_7d"))
          .orderBy("o_custkey", "o_orderkey", "d")
    },

    "fn_lambda" -> Q(
      """SELECT vec_id,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  (len(list_filter(embedding, x -> x > 0.5)) > 0) AS any_big,
        |  CAST(ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'), 3) AS DECIMAL(18,3)) AS sum_sq
        |FROM read_parquet('{sfDir}/embeddings.parquet')
        |ORDER BY vec_id""".stripMargin) {
      (s, d) => T.embeddings(s, d).select(
        col("vec_id"),
        expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
        expr("exists(embedding, x -> x > 0.5)").as("any_big"),
        expr("CAST(ROUND(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 3) AS DECIMAL(18,3))")
          .as("sum_sq"))
        .orderBy("vec_id")
    },

    "fn_hash" -> Q(
      """SELECT c_custkey,
        |  md5(c_name) AS h_md5,
        |  sha256(c_name) AS h_sha256,
        |  base64(CAST(c_name AS BLOB)) AS b64
        |FROM read_parquet('{sfDir}/customer.parquet')
        |ORDER BY c_custkey""".stripMargin) {
      (s, d) => T.customer(s, d).select(
        col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"),
        base64(col("c_name").cast("binary")).as("b64"))
        .orderBy("c_custkey")
    },

    "fn_bitwise" -> Q(
      """SELECT p_partkey,
        |  p_size & 12 AS b_and, p_size | 5 AS b_or, xor(p_size, 255) AS b_xor,
        |  p_size << 2 AS b_shl, p_size >> 1 AS b_shr,
        |  bit_count(p_size) AS b_cnt
        |FROM read_parquet('{sfDir}/part.parquet')
        |ORDER BY p_partkey""".stripMargin) {
      (s, d) => T.part(s, d).select(
        col("p_partkey"),
        expr("p_size & 12").as("b_and"),
        expr("p_size | 5").as("b_or"),
        expr("p_size ^ 255").as("b_xor"),
        expr("shiftleft(p_size, 2)").as("b_shl"),
        expr("shiftright(p_size, 1)").as("b_shr"),
        expr("bit_count(p_size)").as("b_cnt"))
        .orderBy("p_partkey")
    }
  )
}
