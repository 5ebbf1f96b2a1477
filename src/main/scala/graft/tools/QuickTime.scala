package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc warm timing of declared queries (probe-only): one warm pass,
  * then 3 timed passes, min printed — the bench's min-of-N discipline
  * without the 252-query sweep. Usage:
  *   sbt -batch "runMain graft.tools.QuickTime /root/testdata/sf0.1 q1 q2"
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000") // r17, see Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("agg_pricing")(spark, sfDir).count() // warm session
    names.foreach { name =>
      val scope0 = graft.ops.CacheScope.begin(spark)
      graft.SparkEntry.queries(name)(spark, sfDir).count() // warm
      scope0.release(); spark.sharedState.cacheManager.clearCache()
      val ts = (1 to 3).map { _ =>
        val scope = graft.ops.CacheScope.begin(spark)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        scope.release(); spark.sharedState.cacheManager.clearCache()
        dt
      }
      println(f"[qt] $name%-20s min=${ts.min}%5.2f  runs=${ts.map(t => f"$t%.2f").mkString("/")}")
    }
    spark.stop()
  }
}
