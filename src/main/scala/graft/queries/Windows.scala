package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window functions (SURVEY §2.5). Every frame fully specified, every
  * window order made deterministic with a unique tie-break column.
  *
  * Scale note: all windows are partitioned by a key (o_custkey, brand,
  * returnflag) — never a single global partition — so the sort behind
  * each WindowExec distributes and spills per partition.
  */
object Windows {

  val defs: Map[String, Q] = Map(

    "win_rank" -> Q(
      """SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            dec2(col("o_totalprice")).as("price"),
            rank().over(w).as("rnk"))
          .orderBy("o_custkey", "rnk", "o_orderkey")
    },

    "win_row_number" -> Q(
      """SELECT o_custkey, o_orderkey,
        |       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_custkey, rn""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        T.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"))
          .orderBy("o_custkey", "rn")
    },

    "win_dense_ntile" -> Q(
      """SELECT o_custkey, o_orderkey,
        |       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)) AS dr,
        |       NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nt
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_custkey, o_orderkey""".stripMargin) {
      (s, d) =>
        val wd = Window.partitionBy("o_custkey").orderBy(to_date(col("o_orderdate")))
        val wn = Window.partitionBy("o_custkey").orderBy(col("o_orderkey"))
        T.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            dense_rank().over(wd).as("dr"),
            ntile(4).over(wn).as("nt"))
          .orderBy("o_custkey", "o_orderkey")
    },

    "win_lag_lead" -> Q(
      """SELECT o_custkey, o_orderkey,
        |       CAST(LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DECIMAL(18,2)) AS prev_price,
        |       CAST(LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DECIMAL(18,2)) AS next_price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_custkey, o_orderkey""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        T.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            dec2(lag(col("o_totalprice"), 1).over(w)).as("prev_price"),
            dec2(lead(col("o_totalprice"), 1).over(w)).as("next_price"))
          .orderBy("o_custkey", "o_orderkey")
    },

    "win_running_sum" -> Q(
      """SELECT l_returnflag, l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_d,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER
        |         (PARTITION BY l_returnflag
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS running
        |FROM read_parquet('{sfDir}/lineitem.parquet')
        |ORDER BY l_returnflag, ship_d, l_orderkey, l_linenumber, running""".stripMargin) {
      (s, d) =>
        // Window order includes the summed column itself: rows tied on all
        // other keys are identical, so the emitted (row, running) multiset
        // is engine-independent; the final ORDER BY includes `running` to
        // fix the sequence.
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.lineitem(s, d)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            to_date(col("l_shipdate")).as("ship_d"),
            dec2(sum(dec2(col("l_extendedprice"))).over(w)).as("running"))
          .orderBy("l_returnflag", "ship_d", "l_orderkey", "l_linenumber", "running")
    },

    "win_moving_avg" -> Q(
      """SELECT o_custkey, o_orderkey,
        |       CAST(ROUND(AVG(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS DECIMAL(18,6)) AS mavg
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_custkey, o_orderkey""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey"))
          .rowsBetween(-6, Window.currentRow)
        T.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            dec6(avg(dec2(col("o_totalprice"))).over(w)).as("mavg"))
          .orderBy("o_custkey", "o_orderkey")
    },

    "topk_per_group" -> Q(
      """SELECT p_brand, rn, p_partkey, price FROM (
        |  SELECT p_brand, p_partkey, CAST(p_retailprice AS DECIMAL(18,2)) AS price,
        |         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM read_parquet('{sfDir}/part.parquet')) t
        |WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        T.part(s, d)
          .select(col("p_brand"), col("p_partkey"),
            dec2(col("p_retailprice")).as("price"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .select("p_brand", "rn", "p_partkey", "price")
          .orderBy("p_brand", "rn")
    }
  )
}
