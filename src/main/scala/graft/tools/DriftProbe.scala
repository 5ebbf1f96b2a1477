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
  *
  * Round-16 `norm` mode (VERDICT r15 #1 "DriftProbe validates the
  * estimator on one loud/quiet pair"):
  *   sbt -batch "runMain graft.tools.DriftProbe norm [sfDir]"
  * measures (a) the quiet-box cost of Bench's ambient probe (to pin
  * Bench.ProbeRef), (b) a few representative queries quiet — ground
  * truth — then (c) the same queries with N/2 busy-spin hog threads
  * loading the box, recording (probe, raw) pairs and the normalized
  * estimate raw·min(1, ProbeRef/probe). The estimator passes if the
  * loud-window normalized value lands near the quiet raw while the
  * loud raw reads far above it.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("norm")) { normMode(args.drop(1)); return }
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

  /** Loud/quiet estimator validation for Bench's per-query normalizer. */
  private def normMode(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.{sum, xxhash64, pmod, col, lit}
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 6000000L, 1, 32)
        .select(sum(pmod(xxhash64(col("id")), lit(1048576L)))).head()
      (System.nanoTime() - t0) / 1e9
    }
    def timeOne(name: String): (Double, Double) = {
      val fn = graft.SparkEntry.queries(name)
      val scope = graft.ops.CacheScope.begin(spark)
      val p = probeOnce()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      scope.release()
      spark.sharedState.cacheManager.clearCache()
      (p, dt)
    }
    val queries = Seq("agg_pricing", "sql_q3", "win_rank", "eval_confusion")
    // Warm everything (JIT, codegen, probe) outside any measured window.
    (1 to 8).foreach(_ => probeOnce())
    queries.foreach(timeOne)
    // (a) quiet probe cost — pins Bench.ProbeRef.
    val quietProbes = (1 to 20).map(_ => probeOnce())
    println(f"[norm] quiet probe: min ${quietProbes.min}%.4f  " +
      f"median ${quietProbes.sorted.apply(10)}%.4f  max ${quietProbes.max}%.4f  " +
      f"(Bench.ProbeRef = ${graft.Bench.ProbeRef}%.4f)")
    def estimate(p: Double, t: Double): Double =
      t * math.max(graft.Bench.NormFloor,
        math.min(1.0, graft.Bench.ProbeRef / p))
    // (b) quiet ground truth: min of 3 per query.
    val quiet = queries.map { q =>
      val ss = (1 to 3).map(_ => timeOne(q))
      q -> ss.minBy(_._2)
    }.toMap
    quiet.foreach { case (q, (p, t)) =>
      println(f"[norm] quiet  $q%-16s raw $t%7.3f  probe $p%6.3f  est ${estimate(p, t)}%7.3f")
    }
    // (c) loud window: 64 busy-spin hogs (2× the box — CFS then gives
    // Spark's 32 worker threads roughly a third of each core, the kind
    // of contention the r15 driver window showed) + same sampling.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hogs = (1 to 64).map { _ =>
      val t = new Thread(() => {
        var x = 1L
        while (!stop.get()) { var i = 0; while (i < (1 << 22)) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 } }
        if (x == 42) println(x) // defeat dead-code elimination
      })
      t.setDaemon(true); t.start(); t
    }
    try {
      Thread.sleep(500) // let the hogs saturate before sampling
      queries.foreach { q =>
        val ss = (1 to 3).map(_ => timeOne(q))
        val (p, t) = ss.minBy(_._1) // quietest-probe pass, Bench's pairing
        val (qp, qt) = quiet(q)
        println(f"[norm] loud   $q%-16s raw $t%7.3f  probe $p%6.3f  " +
          f"est ${estimate(p, t)}%7.3f  (quiet raw $qt%7.3f, ratio raw ${t / qt}%5.2f, ratio est ${estimate(p, t) / qt}%5.2f)")
      }
    } finally { stop.set(true); hogs.foreach(_.join(1000)) }
    spark.stop()
  }
}
