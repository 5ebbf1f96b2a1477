package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session on sf0.001 (cheap) across operator families —
    // scheduler, whole-stage codegen, native kernel JIT (C2), parquet
    // footer caches — so no measured query absorbs one-time JVM costs.
    // Without this the first few queries in iteration order read 1-2 s
    // heavier than steady state.
    // Tiny fixed-SF warm dir when present; fall back to the bench dir so
    // warm-up still happens (slower, but never silently skipped).
    val warmDir =
      if (java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get("/root/testdata/sf0.001"))) "/root/testdata/sf0.001"
      else sfDir
    Seq("agg_pricing", "win_rank", "stream_tumbling", "sim_cosine_topk",
        "dedup_minhash", "text_tfidf", "sim_ann_ivf", "sim_ann_pq",
        "sim_ann_ivfpq", "sim_ann_int8", "sim_ann_filtered").foreach { w =>
      SparkEntry.queries.get(w).foreach { fn =>
        try fn(spark, warmDir).count() catch { case _: Throwable => }
      }
    }
    // Drop anything the warm-up pinned (dedup_minhash persists its
    // shingle relation) so pass 1 starts from a clean cache.
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    // Deterministic measurement order (Map iteration order is not).
    // Two timed iterations, report the per-query MIN: a single sample on
    // a contended box folds scheduler noise into the number (r2/r3 driver
    // runs read 1.5-2.5x a clean pass); the min of two is the better
    // estimate of the query's actual cost. A failed pass is recorded as
    // the -1 sentinel and never wins the min — pass 1's real timing
    // survives a flaky pass 2 (and vice versa).
    // Each query runs in its own cache arena: queries that persist
    // intermediates (minhash/keep_rep/ANN pipelines) would otherwise
    // leave InMemoryRelations behind that the CacheManager substitutes
    // into LATER equivalent plans by canonicalized-plan match — pass 2
    // (and in-pass siblings like dedup_keep_rep after dedup_minhash)
    // would time warm-cache reads, not the query. The scope releases the
    // pinned RDD blocks; the clearCache drops the plan-level entries so
    // nothing warns ("already cached") or silently substitutes. Both run
    // OUTSIDE the timed window.
    def timeOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val scope = graft.ops.CacheScope.begin(spark)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      scope.release()
      spark.sharedState.cacheManager.clearCache()
      if (ok) dt else -1.0
    }
    // Local-iteration filter (comma-separated names); the driver never
    // sets it → full board.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def timeAll(): Map[String, Double] =
      SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.contains(n)))
        .map(n => n -> timeOne(n)).toMap
    // Ambient-load calibration (VERDICT r7 task 6): the driver's box is
    // sometimes loaded, inflating every query uniformly (r7 measured a
    // uniform 1.26× vs the builder's run on the identical tree). Re-time
    // one fixed cheap query — the flagship agg_pricing — at bench start,
    // middle, and end, and emit the three samples as calib_sec so a
    // reader can noise-normalize the total against any other round's
    // calibration. Calibration runs are NOT part of the total.
    def calib(): Double = timeOne("agg_pricing")
    val calib0 = calib()
    val s1 = timeAll()
    val calib1 = calib()
    val s2 = timeAll()
    def best(a: Double, b: Double): Double =
      if (a < 0) b else if (b < 0) a else math.min(a, b)
    val min2 = s1.map { case (k, v) => k -> best(v, s2.getOrElse(k, -1.0)) }
    // Per-query min-of-N: N=2 for the sub-second bulk, N=3 above 1 s.
    // The handful of >1 s queries carry nearly all of the
    // round-over-round variance (driver runs on a contended box read
    // 1.1-1.5x a clean pass), so one extra sample where it matters keeps
    // BENCH_r{N} comparisons meaningful without re-running all 150.
    // Per-query ambient probe (VERDICT r11 #7): immediately before each
    // third-pass sample, re-time the fixed calibration query. A reader
    // comparing BENCH_r{N} rounds can then tell "this query regressed"
    // from "the host was slow during exactly this query's window" PER
    // ROW — the whole-run calib triple cannot localize a transient.
    val s3calib = scala.collection.mutable.Map.empty[String, Double]
    val s3 = min2.filter { case (_, v) => v > 1.0 }.keys.toSeq.sorted
      .map { n => s3calib(n) = calib(); n -> timeOne(n) }.toMap
    val results = min2.map { case (k, v) => k -> best(v, s3.getOrElse(k, -1.0)) }
    val calib2 = calib()
    // Compact formatting (4 decimals, ~1.7 KB for 85 queries) and print
    // AFTER spark.stop(): round-1's full-double-repr line was clipped by
    // the driver's stdout tail window (BENCH_r01.json parsed: null).
    def f(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    // Ascending by time: the driver's stdout window keeps line TAILS, so
    // at 241 queries the head of this line is clipped — sorting slowest-
    // last puts every query anyone would ask about (the >0.5 s tail)
    // inside the visible window, adjacent to the total (VERDICT r10 #3).
    val qs = results.toSeq.sortBy { case (k, v) => (v, k) }
      .map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    spark.stop()
    // calib_sec: three timings of the fixed flagship probe (start /
    // mid / end of the bench) for ambient-load normalization. "only":
    // present IFF SPARK_GRAFT_ONLY filtered the board — a partial run
    // must be distinguishable from a full one without inspecting
    // n_queries (ADVICE r7).
    val calibJson = s""","calib_sec":[${f(calib0)},${f(calib1)},${f(calib2)}]"""
    // Noise-normalized total (VERDICT r11 #1): r11's +13.4 s "regression"
    // was host-window drift on strictly-faster code — the ±40% same-binary
    // swings the round-11 drift study measured make the RAW total an
    // ambient-load lottery, and the 2×-of-baseline gate must not hinge on
    // it. total_norm rescales by the run's own median calibration sample
    // against CALIB_REF = 0.35 s, the clean-box flagship cost (midpoint of
    // the r10/r11 calib triples [0.49,0.35,0.34]/[0.41,0.39,0.31] at their
    // quietest): a run on a 1.3×-loaded box reads calib ≈ 0.46 and its
    // total shrinks by the same factor. Raw total stays primary; the
    // normalized one is the cross-round comparator.
    val calibRef = 0.35
    val calibMed = Seq(calib0, calib1, calib2).filter(_ > 0).sorted match {
      case s if s.nonEmpty => s(s.size / 2)
      case _ => -1.0
    }
    val normJson = if (calibMed > 0)
      s""","total_norm":${f(total * calibRef / calibMed)},"calib_ref":${f(calibRef)}"""
    else ""
    // calib_at: the ambient probe taken immediately before each
    // third-pass (>1 s) query's sample — the per-row drift context for
    // the slowest tail (VERDICT r11 #7). Keyed by query, slowest-last,
    // capped at the 8 slowest so the parsed line stays inside the
    // driver's stdout tail window.
    val calibAtJson = {
      val slowest = results.toSeq.sortBy { case (k, v) => (-v, k) }.take(8)
        .sortBy { case (k, v) => (v, k) }.map(_._1)
        .flatMap(n => s3calib.get(n).map(c => "\"" + n + "\":" + f(c)))
      if (slowest.isEmpty) ""
      else slowest.mkString(""","calib_at":{""", ",", "}")
    }
    val onlyJson = only.map(s =>
      s""","only":"${s.toSeq.sorted.mkString(",")}"""").getOrElse("")
    // min_of documents the sampling discipline (VERDICT r6 task 6):
    // every query is the min of 2 passes, queries over 1 s get a third.
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","min_of":"2, 3 if >1s"$calibJson$normJson$onlyJson,"queries":$qs,"sf":"$sfDir"}""")
    // The per-query line above outgrew the driver's stdout tail window at
    // 118 queries (the window keeps line TAILS, so the leading total was
    // clipped — BENCH_r01..r04 all parsed null). This final compact line
    // is what the driver actually gets to parse; it always fits.
    // top20: the 20 slowest queries inline in the parsed line, so the
    // board's expensive tail is graded even if the full per-query line
    // above is clipped entirely (~600 B, always fits the tail window).
    val topJson = results.toSeq.sortBy { case (k, v) => (-v, k) }.take(20)
      .sortBy { case (k, v) => (v, k) }
      .map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString(""","top20":{""", ",", "}")
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","n_queries":${results.size},"min_of":"2, 3 if >1s"$calibJson$normJson$calibAtJson$onlyJson$topJson,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
