package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local tuning tool (NOT on any declared path): same-session A/B of the
  * sql_q21 tail (r10 join-back form vs r11 struct-carry form) plus the
  * ×8 scaling exponent of the declared shape. Same-session alternation
  * is the point — this box's ambient speed swings ±40% across minutes
  * (round-11 finding), so cross-run comparisons of single numbers are
  * meaningless; alternating the two forms inside one JVM subjects both
  * to the same drift. Run:
  *   sbt -batch "runMain graft.tools.Q21Probe /root/testdata/sf0.1"
  */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lineitem = graft.Tables.lineitem(spark, sfDir)
    val orders = graft.Tables.orders(spark, sfDir)

    // r10 form: per-pair rollup joined back to per-order stats
    // (ReusedExchange serves the second read of the pair relation).
    def oldQ21(li: DataFrame, o: DataFrame): DataFrame = {
      val l = li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val perSupp = l.groupBy("l_orderkey", "l_suppkey")
        .agg(sum(when(col("late"), 1L).otherwise(0L)).as("n_late_lines"))
      val perOrder = perSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("n_late_lines") > 0, 1L).otherwise(0L)).as("n_late_supp"))
      perSupp.filter(col("n_late_lines") > 0)
        .join(perOrder, Seq("l_orderkey"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(sum(col("n_late_lines")).cast("long").as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(100)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // Warm both forms once (codegen), then alternate 4 measured rounds.
    oldQ21(lineitem, orders).count()
    graft.queries.Extra12.q21Of(lineitem, orders).count()
    val samples = (1 to 4).map { _ =>
      val o = time(oldQ21(lineitem, orders).count())
      val n = time(graft.queries.Extra12.q21Of(lineitem, orders).count())
      println(f"[q21probe] old $o%6.3f  new $n%6.3f")
      (o, n)
    }
    println(f"[q21probe] MIN old ${samples.map(_._1).min}%6.3f  " +
      f"new ${samples.map(_._2).min}%6.3f")

    // ×8 exponent of the declared (new) shape: offset-replicated facts —
    // each replica keys into a disjoint order range, so per-order group
    // sizes (the aggregate's working set per key) are preserved and only
    // the NUMBER of groups scales, which is the honest scale-up for this
    // query (more orders, not deeper orders).
    def repl(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame =
      (0 until n).map { i =>
        keyCols.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i * 100000000L)))
      }.reduce(_ unionAll _)
    for (n <- Seq(1, 8)) {
      val li = repl(lineitem.select("l_orderkey", "l_suppkey", "l_shipdate"),
        Seq("l_orderkey"), n)
      val o = repl(orders.select("o_orderkey", "o_orderdate"),
        Seq("o_orderkey"), n)
      val best = (1 to 3).map(_ =>
        time(graft.queries.Extra12.q21Of(li, o).count())).min
      println(f"[q21probe] scale x$n: $best%6.3f s (min of 3)")
    }
    spark.stop()
  }
}
