package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of dedup_containment under the bench config
  * (local[SPARK_GRAFT_CPUS=4]). Run:
  *   sbt -batch "runMain graft.tools.ContainProbe /root/testdata/sf0.1"
  *
  * MEASURED (r11, this box, local[4], sf0.1, 5000 docs):
  *   gram explode+hash (260k rows)          0.45 s
  *   inverted index (27k grams)             0.52 s
  *   per-doc arrays (5000)                  0.60 s
  *   candidates from warm persist (300k)    0.64 s
  *   verify, SQL array_intersect            ~1.1 s incremental
  *   verify, intersect_size_sorted kernel   ~0.4 s incremental
  *   full declared query  1.37 s → 1.16 s after the kernel swap
  * Two rejected follow-ups, both measured: (a) skipping the candidate
  * distinct and deduping the ~512 survivors after the filter (the
  * kernel makes re-verifying dup candidates cheap) was NOT faster —
  * the saved shuffle is 300k skinny rows, under this box's noise
  * floor; (b) the remaining verify cost is broadcast-build + stage
  * scheduling latency (two broadcast exchanges over the persisted
  * doc-array table), i.e. the many-short-stage shape the SURVEY r11
  * drift note describes — not per-row compute, so no kernel can cut
  * it. The ~1.1 s residual is the pipeline's stage-count floor here;
  * on a real cluster the same stages amortize over real data volume.
  *
  * r12 re-probe (VERDICT r11 #3's two suggestions + one more, each
  * A/B'd interleaved in one JVM at local[32] with a calibration query
  * before every sample, results byte-equal in all cases):
  *   V1 current form                     quiet-window min 1.25-1.41 s
  *   V2 one-row doc_id→grams MAP combine (the agg_minhash_merge
  *      discipline: single map_from_arrays agg, 1-row broadcast,
  *      element_at lookups replacing both broadcast joins)  1.65-1.77 s
  *      — SLOWER: the single-partition map agg + per-row map hashing
  *      cost more than the two tiny broadcast builds they replace.
  *   V3 V2 + verify-before-distinct (dedupe survivors)       1.35-1.46 s
  *   V5 candidates from the persisted inverted index (probe joins
  *      byGram on g, reusing its groupBy partitioning; no 260k-row
  *      index re-explode)        statistically tied with V1 (±0.05 s)
  * Conclusion: the current form IS the stage floor; the driver-visible
  * 1.9 s vs the ~1.2-1.4 s quiet floor is host-window jitter (compare
  * BENCH calib_at), not plan damage. No change shipped.
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("dedup_containment")
    fn(spark, d).count() // JIT + footer warm
    def time(label: String)(body: => Long): Unit = {
      val samples = (1 to 3).map { _ =>
        val scope = graft.ops.CacheScope.begin(spark)
        val t0 = System.nanoTime(); val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        scope.release(); spark.sharedState.cacheManager.clearCache()
        (dt, n)
      }
      println(f"$label%-26s min=${samples.map(_._1).min}%.3f s  n=${samples.head._2}")
    }
    time("full declared query") { fn(spark, d).count() }
    spark.stop()
  }
}
