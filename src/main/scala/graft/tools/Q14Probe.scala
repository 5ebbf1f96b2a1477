package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Local A/B probe (NOT on any declared path): round-14's extension of
  * the staged-bucketed-layout serving (Q8Probe's method) to the
  * remaining fact-join band — sql_q5 / sql_q18 / sql_q4 / sql_q7 — plus
  * sql_q20's single-scan conditional-aggregation rewrite (its joins are
  * partkey-grain, so the orderkey layout can't help it; the candidate
  * cut is scanning lineitem ONCE instead of twice). Run:
  *   sbt -batch "runMain graft.tools.Q14Probe /root/testdata/sf0.1"
  *
  * Each variant pair is alternated ×3 (min reported) and byte-equality
  * checked.
  *
  * MEASURED (this box, local[32], sf0.1, min of 3, all byte-equal):
  *   sql_q5   A=0.85  B=0.67   → shipped bucketed
  *   sql_q18  A=0.52  B=0.29   → shipped bucketed (pre-agg exchange-free)
  *   sql_q4   A=0.53  B=0.16   → shipped bucketed (the semi join WAS the query)
  *   sql_q7   A=0.53  B=0.40   → shipped bucketed
  *   sql_q20  A=0.47  B=0.56   → NOT shipped: the 87%-selective red
  *     semi-filter makes the second pruned scan cheaper than persisting
  *     the single-scan rollup at local scan costs (floor-pinned in the
  *     sql_q20 comment; the rewrite stays here for the scan-bound regime).
  */
object Q14Probe {
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
    val s = spark

    // Plain fact frames (variant A) vs the staged bucketed tables (B).
    val (to, tl) = graft.queries.Extra10.bucketedTables(s, sfDir)
    def plainL = T.lineitem(s, sfDir)
    def plainO = T.orders(s, sfDir)
    def bktL = s.table(tl)
    def bktO = s.table(to)

    // q20 variants: current two-scan form vs single-scan conditional agg.
    def q20Single(): DataFrame = {
      val red = T.part(s, sfDir).filter(col("p_name").like("red%"))
        .select("p_partkey")
      val base = plainL.select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(broadcast(red), col("l_partkey") === col("p_partkey"), "left_semi")
      val avail = base.groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity")).as("aq"),
          sum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                   col("l_shipdate") < lit("1998-01-01").cast("timestamp"),
            col("l_quantity")).otherwise(lit(0.0))).as("aq97"))
        .transform(Q.sketchPersist)
      val need = avail.groupBy(col("l_partkey").as("pk"))
        .agg((lit(0.5) * sum(col("aq97"))).as("half"))
      val excess = avail
        .join(need, col("l_partkey") === col("pk"))
        .filter(col("aq") > col("half"))
        .select(col("l_suppkey"))
      T.supplier(s, sfDir).filter(col("s_nationkey").isin(3, 5))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }

    val variants: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("sql_q5",
        () => graft.queries.Extra12.q5Of(s, sfDir, plainL, plainO),
        () => graft.queries.Extra12.q5Of(s, sfDir, bktL.hint("merge"), bktO)),
      ("sql_q18",
        () => graft.queries.Extra12.q18Of(s, sfDir, plainL, plainO),
        () => graft.queries.Extra12.q18Of(s, sfDir, bktL, bktO.hint("merge"))),
      ("sql_q4",
        () => graft.queries.Extra13.q4Of(plainL, plainO),
        () => graft.queries.Extra13.q4Of(bktL, bktO.hint("merge"))),
      ("sql_q7",
        () => graft.queries.Extra14.q7Of(s, sfDir, plainL, plainO),
        () => graft.queries.Extra14.q7Of(s, sfDir, bktL.hint("merge"), bktO)),
      ("sql_q20",
        () => graft.SparkEntry.queries("sql_q20")(s, sfDir),
        () => q20Single()))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    graft.SparkEntry.queries("agg_pricing")(s, sfDir).count() // warm session
    variants.foreach { case (name, a, b) =>
      a().count(); b().count() // warm both (codegen + staged reads)
      val ta = collection.mutable.Buffer[Double]()
      val tb = collection.mutable.Buffer[Double]()
      for (_ <- 1 to 3) {
        ta += time { a().count(); () }
        tb += time { b().count(); () }
      }
      val ra = a().collect().toSeq
      val rb = b().collect().toSeq
      println(f"[probe] $name%-8s A=${ta.min}%5.2f  B=${tb.min}%5.2f  " +
        f"equal=${ra == rb}")
      if (ra != rb) {
        println(s"[probe]   A: ${ra.take(5).mkString(" | ")}")
        println(s"[probe]   B: ${rb.take(5).mkString(" | ")}")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
