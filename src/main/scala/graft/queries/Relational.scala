package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._

/** Relational core (SURVEY §2.1-2.4, §2.6-2.7): scans, filters,
  * projections, joins, aggregations, sorts, set ops.
  *
  * Every query obeys the determinism contract of SURVEY §2: total output
  * order, DECIMAL casts before aggregation, explicit tie-breaks, and
  * NULLS FIRST/LAST spelled on both engines.
  *
  * Scale notes (100 TB design): all plans here are shuffle-minimal —
  * filters/projections reach the parquet scan (predicate pushdown +
  * column pruning), dimension joins are broadcast, fact-fact joins are
  * equi-keyed (shuffle hash / sort-merge with AQE), and aggregations use
  * Spark's two-phase partial+final HashAggregate.
  */
object Relational {

  private def li(s: org.apache.spark.sql.SparkSession, d: String) = T.lineitem(s, d)

  val defs: Map[String, Q] = Map(

    // ---------------------------------------------------------- §2.1 scans
    "scan_parquet" -> Q(
      "SELECT count(*) AS n FROM read_parquet('{sfDir}/lineitem.parquet')") {
      (s, d) => li(s, d).agg(count(lit(1)).as("n"))
    },

    "scan_prune" -> Q(
      """SELECT l_orderkey, l_quantity
        |FROM read_parquet('{sfDir}/lineitem.parquet')
        |ORDER BY l_orderkey, l_quantity""".stripMargin) {
      // Column pruning: ReadSchema must show only these 2 of 11 columns.
      (s, d) => li(s, d).select("l_orderkey", "l_quantity")
        .orderBy("l_orderkey", "l_quantity")
    },

    // --------------------------------------------- §2.2 projection / filter
    "project_expr" -> Q(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS net_price
        |FROM read_parquet('{sfDir}/lineitem.parquet')
        |ORDER BY l_orderkey, l_linenumber, net_price""".stripMargin) {
      (s, d) => li(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        dec4(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .as("net_price"))
        .orderBy("l_orderkey", "l_linenumber", "net_price")
    },

    "filter_cmp" -> Q(
      """SELECT l_orderkey, l_linenumber, l_quantity, CAST(l_shipdate AS DATE) AS ship_d
        |FROM read_parquet('{sfDir}/lineitem.parquet')
        |WHERE (l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 30)
        |   OR (l_returnflag = 'R' AND l_quantity <= 5)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, ship_d""".stripMargin) {
      (s, d) => li(s, d)
        .filter((col("l_shipdate") < lit("1997-01-01").cast("timestamp")
            && col("l_quantity") > 30)
          || (col("l_returnflag") === "R" && col("l_quantity") <= 5))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          to_date(col("l_shipdate")).as("ship_d"))
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic data —
        // order by every emitted column for a total order.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "ship_d")
    },

    "filter_in" -> Q(
      """SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM read_parquet('{sfDir}/lineitem.parquet')
        |WHERE l_returnflag IN ('A','R') AND l_quantity < 3
        |ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin) {
      (s, d) => li(s, d)
        .filter(col("l_returnflag").isin("A", "R") && col("l_quantity") < 3)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag")
    },

    "filter_like" -> Q(
      """SELECT p_partkey, p_name, p_type
        |FROM read_parquet('{sfDir}/part.parquet')
        |WHERE p_name LIKE '%red%' OR p_type LIKE 'ECON%'
        |ORDER BY p_partkey""".stripMargin) {
      (s, d) => T.part(s, d)
        .filter(col("p_name").like("%red%") || col("p_type").like("ECON%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    },

    "filter_between" -> Q(
      """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WHERE o_totalprice BETWEEN 100000 AND 150000
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) => T.orders(s, d)
        .filter(col("o_totalprice").between(100000, 150000))
        .select(col("o_orderkey"), dec2(col("o_totalprice")).as("price"))
        .orderBy("o_orderkey")
    },

    "filter_null" -> Q(
      """SELECT o_orderkey,
        |  (NULLIF(o_orderstatus,'P') IS NULL) AS was_p,
        |  (NULLIF(o_orderstatus,'P') IS NOT DISTINCT FROM 'O') AS is_open
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) => T.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).isNull.as("was_p"),
          (nullif(col("o_orderstatus"), lit("P")) <=> lit("O")).as("is_open"))
        .orderBy("o_orderkey")
    },

    // ----------------------------------------------------------- §2.3 joins
    "join_inner" -> Q(
      """SELECT o_orderkey, c_custkey, c_name, CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |FROM read_parquet('{sfDir}/orders.parquet') o
        |JOIN read_parquet('{sfDir}/customer.parquet') c ON o.o_custkey = c.c_custkey
        |WHERE o_totalprice > 400000
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        val o = T.orders(s, d).filter(col("o_totalprice") > 400000)
        val c = T.customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
            dec2(col("o_totalprice")).as("price"))
          .orderBy("o_orderkey")
    },

    "join_broadcast" -> Q(
      """SELECT n_nationkey, n_name, r_name
        |FROM read_parquet('{sfDir}/nation.parquet') n
        |JOIN read_parquet('{sfDir}/region.parquet') r ON n.n_regionkey = r.r_regionkey
        |ORDER BY n_nationkey""".stripMargin) {
      (s, d) =>
        val n = T.nation(s, d)
        val r = T.region(s, d)
        // Explicit broadcast of the 5-row dim: at 100 TB this is the only
        // sane plan — no shuffle of the big side.
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select("n_nationkey", "n_name", "r_name")
          .orderBy("n_nationkey")
    },

    "join_left" -> Q(
      """SELECT c_custkey, o_orderkey, o_orderstatus
        |FROM read_parquet('{sfDir}/customer.parquet') c
        |LEFT JOIN (SELECT * FROM read_parquet('{sfDir}/orders.parquet')
        |           WHERE o_totalprice > 450000) o ON c.c_custkey = o.o_custkey
        |WHERE c_custkey < 200
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin) {
      (s, d) =>
        val c = T.customer(s, d).filter(col("c_custkey") < 200)
        val o = T.orders(s, d).filter(col("o_totalprice") > 450000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .select(col("c_custkey"), col("o_orderkey"), col("o_orderstatus"))
          .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    "join_full" -> Q(
      """SELECT COALESCE(c.c_custkey, o.k) AS custkey, c.c_name,
        |       o.n_orders
        |FROM (SELECT c_custkey, c_name FROM read_parquet('{sfDir}/customer.parquet')
        |      WHERE c_custkey < 20) c
        |FULL JOIN (SELECT o_custkey AS k, count(*) AS n_orders
        |           FROM read_parquet('{sfDir}/orders.parquet')
        |           WHERE o_custkey BETWEEN 10 AND 29 GROUP BY o_custkey) o
        |  ON c.c_custkey = o.k
        |ORDER BY custkey""".stripMargin) {
      (s, d) =>
        val c = T.customer(s, d).filter(col("c_custkey") < 20)
          .select("c_custkey", "c_name")
        val o = T.orders(s, d).filter(col("o_custkey").between(10, 29))
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_orders"))
        c.join(o, c("c_custkey") === o("k"), "full")
          .select(coalesce(col("c_custkey"), col("k")).as("custkey"),
            col("c_name"), col("n_orders"))
          .orderBy("custkey")
    },

    "join_semi" -> Q(
      """SELECT c_custkey, c_name
        |FROM read_parquet('{sfDir}/customer.parquet') c
        |WHERE EXISTS (SELECT 1 FROM read_parquet('{sfDir}/orders.parquet') o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) {
      (s, d) =>
        val c = T.customer(s, d)
        val o = T.orders(s, d).filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
    },

    "join_anti" -> Q(
      """SELECT c_custkey, c_name
        |FROM read_parquet('{sfDir}/customer.parquet') c
        |WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{sfDir}/orders.parquet') o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) {
      (s, d) =>
        val c = T.customer(s, d)
        val o = T.orders(s, d).filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
    },

    "join_theta" -> Q(
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_d,
        |       CAST(o_orderdate AS DATE) AS order_d
        |FROM read_parquet('{sfDir}/lineitem.parquet') l
        |JOIN read_parquet('{sfDir}/orders.parquet') o
        |  ON l.l_orderkey = o.o_orderkey
        | AND l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        |ORDER BY l_orderkey, l_linenumber, ship_d""".stripMargin) {
      (s, d) =>
        // Equi key + range predicate: stays a hash/sort-merge join with a
        // post-filter — never a nested-loop — so it scales.
        val l = li(s, d)
        val o = T.orders(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey")
            && l("l_shipdate") >= o("o_orderdate")
            && l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .select(col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("ship_d"),
            to_date(col("o_orderdate")).as("order_d"))
          .orderBy("l_orderkey", "l_linenumber", "ship_d")
    },

    "join_cross" -> Q(
      """SELECT r_name, n_name
        |FROM read_parquet('{sfDir}/region.parquet') r
        |CROSS JOIN read_parquet('{sfDir}/nation.parquet') n
        |ORDER BY r_name, n_name""".stripMargin) {
      (s, d) => T.region(s, d).crossJoin(T.nation(s, d))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    // -------------------------------------------------------- §2.4 aggs
    "agg_pricing" -> Q(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS sum_disc,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(18,6)) AS sum_charge,
        |  CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,2))), 6) AS DECIMAL(18,6)) AS avg_qty,
        |  CAST(ROUND(AVG(CAST(l_extendedprice AS DECIMAL(18,2))), 6) AS DECIMAL(18,6)) AS avg_price,
        |  CAST(ROUND(AVG(CAST(l_discount AS DECIMAL(18,2))), 6) AS DECIMAL(18,6)) AS avg_disc,
        |  COUNT(*) AS n
        |FROM read_parquet('{sfDir}/lineitem.parquet')
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      // Flagship — TPC-H Q1 shape. Two-phase HashAggregate: partial
      // map-side combine reduces 100 TB of lineitem to 6 groups per
      // partition before the (tiny) shuffle.
      (s, d) =>
        val qty = dec2(col("l_quantity"))
        val price = dec2(col("l_extendedprice"))
        val disc = dec2(col("l_discount"))
        val tax = dec2(col("l_tax"))
        li(s, d)
          .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dec2(sum(qty)).as("sum_qty"),
            dec2(sum(price)).as("sum_base"),
            dec4(sum(price * (lit(1) - disc))).as("sum_disc"),
            dec6(sum(price * (lit(1) - disc) * (lit(1) + tax))).as("sum_charge"),
            dec6(avg(qty)).as("avg_qty"),
            dec6(avg(price)).as("avg_price"),
            dec6(avg(disc)).as("avg_disc"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus")
    },

    "agg_count_distinct" -> Q(
      """SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_seg,
        |       COUNT(DISTINCT c_custkey) AS n_cust
        |FROM read_parquet('{sfDir}/customer.parquet')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) {
      (s, d) => T.customer(s, d)
        .groupBy("c_nationkey")
        .agg(countDistinct(col("c_mktsegment")).as("n_seg"),
          countDistinct(col("c_custkey")).as("n_cust"))
        .orderBy("c_nationkey")
    },

    "agg_having" -> Q(
      """SELECT o_custkey, COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend
        |FROM read_parquet('{sfDir}/orders.parquet')
        |GROUP BY o_custkey HAVING COUNT(*) >= 17
        |ORDER BY o_custkey""".stripMargin) {
      (s, d) => T.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), dec2(sum(dec2(col("o_totalprice")))).as("spend"))
        .filter(col("n") >= 17)
        .orderBy("o_custkey")
    },

    "agg_distinct" -> Q(
      """SELECT DISTINCT c_mktsegment
        |FROM read_parquet('{sfDir}/customer.parquet')
        |ORDER BY c_mktsegment""".stripMargin) {
      (s, d) => T.customer(s, d).select("c_mktsegment").distinct()
        .orderBy("c_mktsegment")
    },

    "agg_minmax" -> Q(
      """SELECT CAST(MIN(o_orderdate) AS DATE) AS min_d, CAST(MAX(o_orderdate) AS DATE) AS max_d,
        |       MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
        |       COUNT(*) AS n
        |FROM read_parquet('{sfDir}/orders.parquet')""".stripMargin) {
      (s, d) => T.orders(s, d).agg(
        to_date(min(col("o_orderdate"))).as("min_d"),
        to_date(max(col("o_orderdate"))).as("max_d"),
        min(col("o_orderkey")).as("min_k"),
        max(col("o_orderkey")).as("max_k"),
        dec2(sum(dec2(col("o_totalprice")))).as("total"),
        count(lit(1)).as("n"))
    },

    "agg_rollup" -> Q(
      """SELECT COALESCE(r_name,'ALL') AS region, COALESCE(n_name,'ALL') AS nation,
        |       COUNT(*) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS bal
        |FROM read_parquet('{sfDir}/customer.parquet') c
        |JOIN read_parquet('{sfDir}/nation.parquet') n ON c.c_nationkey = n.n_nationkey
        |JOIN read_parquet('{sfDir}/region.parquet') r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin) {
      (s, d) =>
        val c = T.customer(s, d)
        val n = T.nation(s, d)
        val r = T.region(s, d)
        val joined = c
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("r_name"), col("n_name"), col("c_acctbal"))
        // Dataset.rollup makes its grouping columns ambiguous for a
        // follow-up COALESCE select in Spark 4.1 — go through SQL instead.
        joined.createOrReplaceTempView("cust_geo")
        s.sql(
          """SELECT COALESCE(r_name,'ALL') AS region, COALESCE(n_name,'ALL') AS nation,
            |       COUNT(*) AS n_cust,
            |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS bal
            |FROM cust_geo
            |GROUP BY ROLLUP(r_name, n_name)
            |ORDER BY region, nation""".stripMargin)
    },

    "agg_cube" -> Q(
      """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |       COUNT(*) AS n
        |FROM read_parquet('{sfDir}/lineitem.parquet')
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin) {
      (s, d) => li(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(dec2(sum(dec2(col("l_quantity")))).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls")
    },

    "agg_grouping_sets" -> Q(
      """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |       COUNT(*) AS n
        |FROM read_parquet('{sfDir}/lineitem.parquet')
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin) {
      (s, d) =>
        li(s, d).createOrReplaceTempView("li_gs")
        s.sql(
          """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
            |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
            |       COUNT(*) AS n
            |FROM li_gs
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY rf, ls""".stripMargin)
    },

    // ------------------------------------------------- §2.6 sorts / top-k
    "sort_multi" -> Q(
      """SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |FROM read_parquet('{sfDir}/customer.parquet')
        |ORDER BY c_nationkey ASC NULLS FIRST, bal DESC NULLS LAST, c_custkey""".stripMargin) {
      (s, d) => T.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          dec2(col("c_acctbal")).as("bal"))
        .orderBy(col("c_nationkey").asc_nulls_first,
          col("bal").desc_nulls_last, col("c_custkey"))
    },

    "limit_topk" -> Q(
      """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
      // orderBy+limit → TakeOrderedAndProject: per-partition top-k then a
      // single-driver merge of k·partitions rows — no global sort at scale.
      (s, d) => T.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"),
          dec2(col("o_totalprice")).as("price"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "price")
    },

    // ----------------------------------------------------- §2.7 set ops
    "set_union_all" -> Q(
      """SELECT 'c' AS src, c_nationkey AS k FROM read_parquet('{sfDir}/customer.parquet')
        |UNION ALL
        |SELECT 's' AS src, s_nationkey AS k FROM read_parquet('{sfDir}/supplier.parquet')
        |ORDER BY src, k""".stripMargin) {
      (s, d) =>
        val c = T.customer(s, d).select(lit("c").as("src"), col("c_nationkey").as("k"))
        val sup = T.supplier(s, d).select(lit("s").as("src"), col("s_nationkey").as("k"))
        c.unionAll(sup).orderBy("src", "k")
    },

    "set_union" -> Q(
      """SELECT c_nationkey AS k FROM read_parquet('{sfDir}/customer.parquet')
        |UNION
        |SELECT s_nationkey AS k FROM read_parquet('{sfDir}/supplier.parquet')
        |ORDER BY k""".stripMargin) {
      (s, d) => T.customer(s, d).select(col("c_nationkey").as("k"))
        .union(T.supplier(s, d).select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy("k")
    },

    "set_intersect" -> Q(
      """SELECT c_nationkey AS k FROM read_parquet('{sfDir}/customer.parquet')
        |INTERSECT
        |SELECT s_nationkey AS k FROM read_parquet('{sfDir}/supplier.parquet')
        |ORDER BY k""".stripMargin) {
      (s, d) => T.customer(s, d).select(col("c_nationkey").as("k"))
        .intersect(T.supplier(s, d).select(col("s_nationkey").as("k")))
        .orderBy("k")
    },

    "set_except" -> Q(
      """SELECT c_custkey AS k FROM read_parquet('{sfDir}/customer.parquet')
        |EXCEPT
        |SELECT o_custkey AS k FROM read_parquet('{sfDir}/orders.parquet') WHERE o_orderstatus = 'P'
        |ORDER BY k""".stripMargin) {
      (s, d) => T.customer(s, d).select(col("c_custkey").as("k"))
        .except(T.orders(s, d).filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    }
  )
}
