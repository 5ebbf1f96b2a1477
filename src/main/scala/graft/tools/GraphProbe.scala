package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the graph traversal forms (r15, VERDICT r14 #2):
  * DataFrame round loop (per-round Catalyst planning) vs RDD round
  * loop over the staged partitioner-pinned adjacency. Also the place
  * where the SQUARED-edge-relation variant (e2 = e⋈e, hop weights —
  * the verdict's proposed fix) was measured and REJECTED: e2 held
  * 21.6M pairs vs e's 1.2M at sf0.1 (18×), and the 2-round traversal
  * over it read 3.0-3.4 s (persisted) / 1.9-2.6 s (bucketed scans)
  * against the 4-round baseline's 1.8-2.0 s — the halved planning
  * never paid for scanning 18× the data. The RDD loop attacks the
  * floor directly (no per-round planning at all).
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.GraphProbe [reps]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Extra23
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[graphprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def timedCount(label: String)(df: => DataFrame): Unit = {
      val scope = graft.ops.CacheScope.begin(spark)
      time(label)(df.count())
      scope.release()
      spark.sharedState.cacheManager.clearCache()
    }

    val e = time("stage e table")(Extra23.stagedGraphEdges(spark, sfDir))
    time("stage adjacency rdd")(Extra23.stagedGraphRdd(spark, sfDir))

    def bfsDf(): DataFrame =
      graft.ops.Bfs.multiSourceBfs(spark.table(e),
          Extra23.graphSources(spark, sfDir), maxHops = 4, prePartitioned = true)
        .groupBy("dist").agg(count(lit(1)).as("n"))
    def bfsRdd(): DataFrame = {
      val (erdd, srcs) = Extra23.stagedGraphRdd(spark, sfDir)
      graft.ops.Bfs.multiSourceBfsRdd(erdd, srcs, maxHops = 4)
        .toDF("node", "dist")
        .groupBy("dist").agg(count(lit(1)).as("n"))
    }
    def ssspDf(): DataFrame =
      graft.ops.Bfs.multiSourceSssp(spark.table(e),
          Extra23.graphSources(spark, sfDir), maxHops = 3, prePartitioned = true)
    def ssspRdd(): DataFrame = {
      val (erdd, srcs) = Extra23.stagedGraphRdd(spark, sfDir)
      graft.ops.Bfs.multiSourceSsspRdd(erdd, srcs, maxHops = 3)
        .toDF("node", "d")
    }

    timedCount("warm bfs df")(bfsDf())
    timedCount("warm bfs rdd")(bfsRdd())
    (1 to reps).foreach { i =>
      timedCount(s"bfs df  #$i")(bfsDf())
      timedCount(s"bfs rdd #$i")(bfsRdd())
    }
    timedCount("warm sssp df")(ssspDf())
    timedCount("warm sssp rdd")(ssspRdd())
    (1 to reps).foreach { i =>
      timedCount(s"sssp df  #$i")(ssspDf())
      timedCount(s"sssp rdd #$i")(ssspRdd())
    }
    spark.stop()
  }
}
