package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-15 drift attribution probe (VERDICT r14 #1): the r14 driver
  * run read sql_q5 0.79→0.93, sql_q7 0.69→0.86 and eval_confusion
  * 0.92→1.06 against r13 — OPPOSITE to the builder's quiet-box A/Bs —
  * under quiet whole-run calibration. This probe measures, in ONE
  * session with per-sample calibration (the r11 method):
  *   1. the bucketed vs plain forms of sql_q5/sql_q7 (re-running the
  *      Q14Probe pair on the current tree),
  *   2. eval_confusion sampled ×6 with interleaved calibration, to
  *      size its same-binary variance band,
  *   3. sim_hybrid_rrf's lexical cut: bounded-heap (shipped) vs the
  *      r14 single-window form, via the spark.graft.hybrid.lexCut
  *      conf gate.
  * Usage: sbt -batch "runMain graft.tools.DriftProbe [sfDir] [reps]"
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sample(name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val scope = graft.ops.CacheScope.begin(spark)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      scope.release()
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    def report(label: String, t: Double, calib: Double): Unit =
      println(f"[driftprobe] $label%-24s $t%7.3f s   (calib $calib%6.3f)")

    // Warm the session + staged state outside any timed window.
    Seq("agg_pricing", "sql_q5", "sql_q7", "eval_confusion").foreach(sample)

    // 2. eval_confusion variance band, calibration interleaved.
    (1 to (2 * reps)).foreach { i =>
      val c = sample("agg_pricing")
      report(s"eval_confusion #$i", sample("eval_confusion"), c)
    }

    // 1. q5/q7 on the current (bucketed) tree, calibration interleaved.
    (1 to reps).foreach { i =>
      val c = sample("agg_pricing")
      report(s"sql_q5 #$i", sample("sql_q5"), c)
      report(s"sql_q7 #$i", sample("sql_q7"), c)
    }

    // 3. hybrid lexical cut: heap (default) vs window, alternated.
    sample("sim_hybrid_rrf") // stage the int8 index + tf segment
    (1 to reps).foreach { i =>
      val c = sample("agg_pricing")
      spark.conf.set("spark.graft.hybrid.lexCut", "heap")
      report(s"hybrid-heap #$i", sample("sim_hybrid_rrf"), c)
      spark.conf.set("spark.graft.hybrid.lexCut", "window")
      report(s"hybrid-window #$i", sample("sim_hybrid_rrf"), c)
      spark.conf.unset("spark.graft.hybrid.lexCut")
    }
    spark.stop()
  }
}
