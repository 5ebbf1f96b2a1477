package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Local A/B probe (NOT on any declared path): does serving sql_q8's
  * lineitem⋈orders fact join from the staged bucketed layout (the
  * sql_q21 win) pay on this box? Q8's only shuffle join IS that fact
  * join — every dim side broadcasts — so the bucketed variant should
  * delete both fact exchanges. Run:
  *   sbt -batch "runMain graft.tools.Q8Probe /root/testdata/sf0.1"
  *
  * MEASURED (this box, local[32], sf0.1, alternated A/B ×3, min):
  *   see println at the end of a run — numbers recorded in the ship
  *   decision comment on sql_q8 (or here if the variant did NOT ship).
  */
object Q8Probe {
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

    def rev = Q.dec2(col("l_extendedprice")) * (lit(1) - Q.dec2(col("l_discount")))
    def ts(s: String) = lit(s).cast("timestamp")

    // Probe-local widened staging (mirrors Extra10.bucketedTables with
    // the q8/q9 column union) so the probe doesn't disturb the declared
    // staging before the ship decision.
    val base = s"/tmp/graft_q8probe_${Q.perJvmId}"
    val (to, tl) = ("q8p_orders", "q8p_lineitem")
    if (!spark.catalog.tableExists(to)) {
      T.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate")
        .write.format("parquet").bucketBy(8, "o_orderkey")
        .mode("overwrite").option("path", s"$base/orders").saveAsTable(to)
      T.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .write.format("parquet").bucketBy(8, "l_orderkey")
        .mode("overwrite").option("path", s"$base/lineitem").saveAsTable(tl)
    }

    def q8Of(l0: DataFrame, o0: DataFrame, hintMerge: Boolean): DataFrame = {
      val s = spark; val d = sfDir
      val nat = T.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
      val asiaNat = nat
        .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")
      val cust = T.customer(s, d).select("c_custkey", "c_nationkey")
        .join(broadcast(asiaNat), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select("c_custkey")
      val sup = T.supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(nat.select(col("n_nationkey"), col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "nation")
      val stdParts = T.part(s, d).filter(col("p_type") === "STANDARD")
        .select("p_partkey")
      val o = o0
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
                col("o_orderdate") < ts("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val lj = l0
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"), rev.as("volume"))
        .join(broadcast(stdParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      (if (hintMerge) lj.hint("merge") else lj)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy("o_year")
        .agg(
          Q.dec6(round(
            sum(when(col("nation") === "NATION_7", col("volume")).otherwise(lit(0)))
              .cast("double") / sum(col("volume")).cast("double"), 6)).as("mkt_share"),
          Q.dec4(sum(col("volume"))).as("total_volume"))
        .orderBy("o_year")
    }

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-26s $s%7.2f s"); s
    }

    graft.SparkEntry.queries("agg_pricing")(spark, sfDir).count() // warm
    q8Of(spark.table(tl), spark.table(to), hintMerge = true).count() // warm staged reads

    val a = collection.mutable.Buffer[Double]()
    val b = collection.mutable.Buffer[Double]()
    for (_ <- 1 to 3) {
      a += time("A current sql_q8") {
        graft.SparkEntry.queries("sql_q8")(spark, sfDir).count(); ()
      }
      b += time("B bucketed-served q8") {
        q8Of(spark.table(tl), spark.table(to), hintMerge = true).count(); ()
      }
    }
    println(f"[probe] MIN  A=${a.min}%5.2f  B=${b.min}%5.2f")
    // Byte-equality of results (the layout must be lossless for q8):
    val ra = graft.SparkEntry.queries("sql_q8")(spark, sfDir).collect().toSeq
    val rb = q8Of(spark.table(tl), spark.table(to), hintMerge = true)
      .collect().toSeq
    println(s"[probe] results equal: ${ra == rb}")
    if (ra != rb) {
      println(s"[probe] A rows: ${ra.mkString(" | ")}")
      println(s"[probe] B rows: ${rb.mkString(" | ")}")
    }
    spark.stop()
  }
}
