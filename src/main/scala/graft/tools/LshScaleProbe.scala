package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local tuning tool (NOT on any declared path): deep scale points for
  * the sign-LSH pair law (VERDICT r10 #5). The r8 sweep measured the
  * lshParamsFor hold up to ×8; this probe extends to ×64 (and any grid
  * passed as args), where nbits/tables actually step — pinning the
  * exponent where bucket geometry bites rather than extrapolating the
  * (1-P)^T argument. Replicas are distinct 64-cyclic rotations of the
  * corpus ((i·7) mod 64, gcd(7,64)=1 → all 64 rotations distinct), so
  * no replica is a true near-dup of another and bucket occupancy
  * reflects corpus SIZE, not injected duplicates. Run:
  *   sbt -batch "runMain graft.tools.LshScaleProbe /root/testdata/sf0.1 1 8 64"
  *
  * MEASURED (r11, this box, 48-80g driver heap):
  *   x1  nbits=6  T=16  1.65M  pairs   0.70 s (min of 3)
  *   x8  nbits=9  T=49  78.6M  pairs   9.41 s (min of 3)
  *   x16 nbits=10 T=71  276.9M pairs 275.4  s (single pass, spill-bound)
  *   x64 nbits=12 T~148 — KILLED: >57 GB of candidate shuffle before
  *       the dedup finished; this box's disk headroom is the binding
  *       constraint at that volume.
  * The law's VOLUME model is validated: candidates ∝ N · occupancy ·
  * tables · (1+nbits) with occupancy pinned by lshBitsFor — predicted
  * pair growth 35× (x1→x8) and 3.2× (x8→x16) vs measured 47.6× and
  * 3.52×. The COST cliff between x8 (9.4 s) and x16 (275 s, 29× for
  * 3.5× the pairs) is a SINGLE-BOX memory effect, not plan damage: the
  * pair-dedup working set (~780M pre-distinct rows at x16) falls out
  * of the hash-aggregate's memory and every partition spills; on a
  * cluster whose aggregate memory scales with the corpus the volume
  * line is the honest cost. The deep-scale lesson for the τ=0.44
  * Threshold demand: (1−P)^T holds recall, but tables×probes grows
  * ~4.4× per corpus decade, so candidate volume — not signature
  * storage — is what the law spends; production τ≈0.95 grows T ~2.6×
  * more slowly per decade (see lshParamsFor) and lands proportionally
  * lighter.
  *
  * NOTE (late r11): the numbers above were measured against the
  * distinct-based annPairs; the exactly-once rework (minimal shared
  * composite key via first_common_sorted, no pair-dedup exchange)
  * was HYPOTHESIZED to remove the spill-bound distinct behind the ×16
  * cost cliff.
  *
  * RE-MEASURED (r12) — the hypothesis is REFUTED at deep scale. Under
  * the array-carry form, ×16 (T=71, nbits=10, probe=1 → a 781-long
  * key array attached to each of 781 exploded probe rows per vector,
  * ~5 MB of logical join input per vector) EXHAUSTED THIS BOX'S DISK:
  * >40 GB of sort spill, killed by "No space left on device" ~30 min
  * in — strictly worse than the 275 s the skinny+distinct form had
  * posted in r11. The carried-array join bytes grow QUADRATICALLY in
  * tables·(1+nbits); the pair-dedup exchange they replace grows
  * linearly in candidates. Re-run under the r12 volume switch
  * (Sketches.AnnEmitCarryMaxKeys → skinny+distinct at these points):
  *   x8  nbits=9  T=49  78.6M  pairs   5.61 s (min of 3, quiet window;
  *       the array-carry form measured 15.2 s on the same day — the
  *       crossover is already behind us at 490 keys)
  *   x16 nbits=10 T=71  276.9M pairs 372.9  s (1 pass, loaded window,
  *       completes — no disk death; r11 old-form 275 s, same order)
  *   x32 nbits=11 T=102 961.5M pairs 2561.6 s (1 pass — COMPLETES at
  *       ~1e9 pairs where the array-carry form cannot even finish x16.
  *       Two box caveats, both diagnosed: the first attempt died to
  *       local-mode's own 120 s heartbeat timeout during a driver
  *       stall — probe now raises spark.network.timeout for deep
  *       points — and the 6.9x cost for 3.5x the pairs is the agg
  *       working set leaving single-box memory again, the same spill
  *       regime x16 showed in r11. Pair growth x16→x32 measured 3.47x
  *       vs ~3.1x predicted by the volume law — the law holds to 1e9.)
  * Pair counts are bit-identical to r11 (78579683 / 276852649) — the
  * candidate SET is form-invariant, so the volume law stands. The
  * engineering conclusion shipped in Sketches.annPairs: array-carry
  * exactly-once below ~128 keys per vector (where it measurably wins:
  * sim_ann_ivf warm 1.54→0.88), skinny+distinct beyond (where the
  * carry is a disk bomb); SketchesSpec pins both forms equal.
  */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val grid = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 8, 64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // Deep-scale points push ~10^9-row aggregates through one JVM:
      // a single long GC pause (or one of this host's measured multi-
      // minute stalls) exceeds the default 120 s heartbeat window and
      // local-mode then kills its own executor mid-job (observed at the
      // first ×32 attempt, r12). Probe-only settings — the declared
      // paths never run volumes that dwarf the box like this.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs1 = graft.Tables.embeddings(spark, sfDir)
    val n1 = embs1.count()
    def embsX(n: Int) = {
      // The (i*7)%64 rotation yields 64 DISTINCT replicas (gcd(7,64)=1);
      // beyond x64 rotations repeat and replicas become exact duplicates,
      // silently breaking the probe's "no replica is a true near-dup"
      // premise (ADVICE r11) — fail loudly instead.
      require(n <= 64, s"embsX: grid x$n exceeds the 64 distinct " +
        "rotations of a 64-dim embedding; replicas would repeat")
      (0 until n).map { i =>
      val r = (i * 7) % 64
      embs1.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        expr(s"concat(slice(embedding, ${r + 1}, ${64 - r})," +
          s" slice(embedding, 1, $r))").as("embedding"))
      }.reduce(_ unionAll _)
    }

    // JVM warm on the smallest point so the grid's first measured entry
    // doesn't absorb codegen/classload.
    graft.ops.Sketches.annPairsAt(embsX(1),
      graft.ops.Sketches.lshParamsFor(n1, graft.ops.Sketches.LshDemand.Threshold)).count()

    for (n <- grid) {
      val params = graft.ops.Sketches.lshParamsFor(n1 * n,
        graft.ops.Sketches.LshDemand.Threshold)
      // min-of-3 by default: this box's ambient speed swings ±40%
      // (round-11 finding); a single sample cannot carry an exponent
      // claim. MIN_OF=1 for grid points too heavy to repeat.
      val minOf = sys.env.get("MIN_OF").map(_.toInt).getOrElse(3)
      val best = (1 to minOf).map { i =>
        val scope = graft.ops.CacheScope.begin(spark)
        val t0 = System.nanoTime()
        val pairs = graft.ops.Sketches.annPairsAt(embsX(n), params).count()
        val dt = (System.nanoTime() - t0) / 1e9
        scope.release()
        spark.sharedState.cacheManager.clearCache()
        println(f"[lshscale]   x$n pass $i: $dt%7.2f s ($pairs pairs)")
        (dt, pairs)
      }
      println(f"[lshscale] x$n%-3d nbits=${params.nbits} " +
        f"tables=${params.tables} probe=${params.probe} " +
        f"pairs=${best.head._2}%8d  best=${best.map(_._1).min}%7.2f s (min of 3)")
    }
    spark.stop()
  }
}
