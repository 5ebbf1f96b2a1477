package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Step-level A/B of ts_trending (r16 optimization round): where do the
  * 2.1-2.4 s go — the fact-join halves rollup, the two-phase rank, or
  * the pivot/top-10 tail? Also times the r15 single-window rank as the
  * local reference point (the form the two-phase pass replaced for
  * scale-safety).
  * Usage: sbt -batch "runMain graft.tools.TrendProbe [sfDir]"
  */
object TrendProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[trend] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // Stage the bucketed tables once, outside timed windows.
    val (to, tl) = graft.queries.Extra10.bucketedTables(spark, d)
    spark.table(to).count(); spark.table(tl).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val o = spark.table(tl)
        .select(col("l_orderkey"), col("l_partkey").as("p"),
          col("l_quantity").cast("bigint").as("qty"))
        .join(spark.table(to).select(col("o_orderkey").as("l_orderkey"),
          expr("unix_timestamp(o_orderdate) div 86400").as("day")), "l_orderkey")
      val mid = spark.table(to)
        .select(expr("unix_timestamp(o_orderdate) div 86400").as("day"))
        .agg(expr("(min(day) + max(day) + 1) div 2").as("m"))
      val halves = t("halves ckpt") {
        val x = o.crossJoin(broadcast(mid))
          .groupBy("p")
          .agg(sum(when(col("day") < col("m"), col("qty"))).as("qa"),
            sum(when(col("day") >= col("m"), col("qty"))).as("qb"))
          .localCheckpoint(false)
        x.count(); x
      }
      t("rankClimb 2phase") {
        graft.queries.Extra25.rankClimbOf(halves)
          .orderBy(col("climb").desc, col("p")).limit(10).count()
      }
      t("rank single-window") {
        val ra = halves.filter(col("qa").isNotNull)
          .select(col("p"), row_number().over(
            Window.orderBy(col("qa").desc, col("p"))).cast("bigint").as("r_early"))
        val rb = halves.filter(col("qb").isNotNull)
          .select(col("p"), row_number().over(
            Window.orderBy(col("qb").desc, col("p"))).cast("bigint").as("r_late"))
        ra.join(rb, "p")
          .select(col("p"), col("r_early"), col("r_late"),
            (col("r_early") - col("r_late")).as("climb"))
          .orderBy(col("climb").desc, col("p")).limit(10).count()
      }
      t("full query") {
        graft.SparkEntry.queries("ts_trending")(spark, d).count()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
