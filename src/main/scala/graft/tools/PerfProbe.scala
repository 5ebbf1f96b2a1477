package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Local tuning tool (NOT on any declared path): stage-by-stage timing of
  * the heaviest declared pipelines, so perf work targets the stage that
  * actually costs, not the one that looks expensive. Run:
  *   sbt -batch "runMain graft.tools.PerfProbe /root/testdata/sf0.1"
  */
object PerfProbe {
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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // Warm the JVM on the flagship query so stage timings below aren't
    // absorbing codegen/classload costs.
    graft.SparkEntry.queries("agg_pricing")(spark, sfDir).count()

    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")

    // keep_rep stage split (mirrors the query's actual shape: no
    // gate-count job — edgeComponents' bounded union-find is the first
    // materialization of the LSH pipeline).
    val scope = graft.ops.CacheScope.begin(spark)
    val pairs = graft.ops.Sketches.minhashNearDups(docs, threshold = 0.5)
      .select("id1", "id2")
    val labels = time("edgeComponents (LSH + solve)") {
      val l = graft.ops.Components.edgeComponents(pairs)
      l.count(); l
    }
    println(s"[probe] labels = ${labels.count()}")
    time("keep_rep tail (agg+anti+sort)") {
      val clustered = labels.groupBy("rep").agg(count(lit(1)).as("n_docs"))
        .select(col("rep").as("keep_id"), col("n_docs"))
      val singles = docs.select(col("doc_id"))
        .join(labels, col("doc_id") === col("id"), "left_anti")
        .select(col("doc_id").as("keep_id"), lit(1L).as("n_docs"))
      clustered.union(singles).orderBy("keep_id").count()
    }
    scope.release()
    spark.sharedState.cacheManager.clearCache()

    val scope2 = graft.ops.CacheScope.begin(spark)
    time("dedup_keep_rep end-to-end") {
      graft.SparkEntry.queries("dedup_keep_rep")(spark, sfDir).count()
    }
    scope2.release()
    spark.sharedState.cacheManager.clearCache()

    val scope3 = graft.ops.CacheScope.begin(spark)
    time("dedup_cluster end-to-end") {
      graft.SparkEntry.queries("dedup_cluster")(spark, sfDir).count()
    }
    scope3.release()
    spark.sharedState.cacheManager.clearCache()

    val scope4 = graft.ops.CacheScope.begin(spark)
    time("dedup_minhash end-to-end") {
      graft.SparkEntry.queries("dedup_minhash")(spark, sfDir).count()
    }
    scope4.release()
    spark.sharedState.cacheManager.clearCache()

    // Graph family end-to-end (checkpoint/orientation cost tracking).
    // min-of-3: single samples on this box swing ±0.4 s with no code
    // change — the min is the comparable estimate (same as Bench).
    for (g <- Seq("graph_pagerank", "graph_triangles")) {
      val best = (1 to 3).map { _ =>
        val sc = graft.ops.CacheScope.begin(spark)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(g)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        sc.release()
        spark.sharedState.cacheManager.clearCache()
        dt
      }.min
      println(f"[probe] $g%-28s $best%7.2f s (min of 3)")
    }

    // sim_ann_ivf stage breakdown (k=16, nProbe=5, refine=1 — the
    // declared non-degenerate gate params)
    val embs = graft.Tables.embeddings(spark, sfDir)
    val scope5 = graft.ops.CacheScope.begin(spark)
    val seed = time("ivf seed (limit k)") {
      val s = embs.orderBy("vec_id").limit(16)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      s.count(); s
    }
    // A/B both ways — each form is codegen-warmed by its first run, so
    // only the second pair of numbers is comparable.
    def timeNewRound(label: String) = time(label) {
      val c = graft.ops.IvfIndex.refineCentroids(embs, seed, rounds = 1)
      c.count(); c
    }
    def timeOldRound(label: String): Unit = time(label) {
      import org.apache.spark.sql.types.DecimalType
      import org.apache.spark.sql.graft.{native => gn}
      val members = graft.Q.spreadBy(embs, "vec_id")
        .crossJoin(broadcast(seed))
        .select(col("vec_id"),
          struct((-gn.cosine_similarity(col("embedding"), col("cvec"))).as("negsim"),
            col("cid").as("cid"), col("embedding").as("e")).as("cand"))
        .groupBy("vec_id").agg(min(col("cand")).as("best"))
        .select(col("best.cid").as("cid"),
          posexplode(col("best.e")).as(Seq("pos", "v")))
      val means = members.groupBy("cid", "pos")
        .agg(round((sum(col("v").cast(DecimalType(28, 12))) / count(lit(1)))
          .cast("double"), 6).as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))")
          .as("mvec"))
      seed.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mvec"), col("cvec")).as("cvec"))
        .count()
      ()
    }
    timeOldRound("ivf lloyd old #1 (cold)")
    timeNewRound("ivf lloyd new #1 (cold)")
    timeOldRound("ivf lloyd old #2 (warm)")
    val cents = timeNewRound("ivf lloyd new #2 (warm)")
    // Bisect: is the regression the j plumbing (grouping/join keys) or
    // something else in the unified shape?
    def variant(label: String, withJ: Boolean): Unit = time(label) {
      import org.apache.spark.sql.types.DecimalType
      import org.apache.spark.sql.graft.{native => gn}
      val pts0 = graft.Q.spreadBy(embs, "vec_id")
        .select(col("vec_id"), col("embedding").as("sv"))
      val pts = if (withJ) pts0.withColumn("j", lit(0)) else pts0
      val cb0 = seed
      val cb = if (withJ) cb0.withColumn("j", lit(0)) else cb0
      val joined = if (withJ) pts.join(broadcast(cb), "j")
        else pts.crossJoin(broadcast(cb))
      val gk = if (withJ) Seq(col("vec_id"), col("j")) else Seq(col("vec_id"))
      val mk = if (withJ) Seq(col("j"), col("cid")) else Seq(col("cid"))
      val members = joined
        .select((Seq(col("vec_id"),
          struct((-gn.cosine_similarity(col("sv"), col("cvec"))).as("d"),
            col("cid").as("cid"), col("sv").as("sv")).as("cand"))
          ++ (if (withJ) Seq(col("j")) else Nil)): _*)
        .groupBy(gk: _*).agg(min(col("cand")).as("best"))
        .select((mk.dropRight(1) :+ col("best.cid").as("cid")) :+
          posexplode(col("best.sv")).as(Seq("pos", "v")): _*)
      val means = members.groupBy((mk :+ col("pos")): _*)
        .agg(round((sum(col("v").cast(DecimalType(28, 12))) / count(lit(1)))
          .cast("double"), 6).as("m"))
        .groupBy(mk: _*)
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))")
          .as("mvec"))
      cb.join(broadcast(means), if (withJ) Seq("j", "cid") else Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mvec"), col("cvec")).as("cvec"))
        .count()
      ()
    }
    variant("ivf lloyd variant noJ #1", withJ = false)
    variant("ivf lloyd variant noJ #2", withJ = false)
    variant("ivf lloyd variant withJ #1", withJ = true)
    variant("ivf lloyd variant withJ #2", withJ = true)
    val a = time("ivf assign (post-lloyd)") {
      val x = graft.ops.IvfIndex.assign(embs, k = 16, nProbe = 5, refine = 1)
        .persist(StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    time("ivf pairs (min-cell dedup)") {
      graft.ops.IvfIndex.annPairs(embs, k = 16, nProbe = 5, refine = 1).count()
    }
    time("sim_ann_ivf end-to-end") {
      graft.SparkEntry.queries("sim_ann_ivf")(spark, sfDir).count()
    }
    scope5.release()
    spark.sharedState.cacheManager.clearCache()

    // Scaling probe: same pipelines on an 8x corpus. Replicas are
    // PERTURBED, not copied - a copied replica is a true near-dup of
    // the original, so buckets would legitimately explode (64x more
    // real pairs, an adversarial dataset rather than a bigger one).
    // Embeddings rotate per replica (norm-preserving direction change);
    // docs get a per-replica suffix token. A quadratic path would cost
    // 64x; the bucketed sketch paths should stay near-linear. Prints
    // evidence for SURVEY's scale claims - measured, not argued.
    val embs1 = graft.Tables.embeddings(spark, sfDir)
    val docs1 = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    // Rotation taken mod 64 (identical to the bare i*7 for the x8 grid,
    // where i*7 <= 49): gcd(7, 64) = 1 makes all 64 rotations DISTINCT,
    // so the grid extends to x64 without any replica being a true
    // near-dup of another (LshScaleProbe uses the same construction).
    def embsX(n: Int) = {
      // Distinct rotations exist only up to the embedding dim (64);
      // beyond that replicas silently repeat — fail loudly (ADVICE r11).
      require(n <= 64, s"embsX: grid x$n exceeds the 64 distinct " +
        "rotations of a 64-dim embedding; replicas would repeat")
      (0 until n).map { i =>
        val r = (i * 7) % 64
        embs1.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          expr(s"concat(slice(embedding, ${r + 1}, ${64 - r})," +
            s" slice(embedding, 1, $r))").as("embedding"))
      }.reduce(_ unionAll _)
    }
    def docsX(n: Int) = (0 until n).map { i =>
      docs1.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" rep$i token$i")).as("text"))
    }.reduce(_ unionAll _)
    val nEmbs1 = embs1.count()
    for (n <- Seq(1, 8)) {
      // Parameters come from the SHARED law (lshParamsFor), not a probe-
      // local constant: nbits grows with log(N) so bucket occupancy (the
      // join fan-out driver) stays ~constant across the 8x scale-up —
      // the probe exists to show that hold. (Earlier rounds hard-coded
      // the nbits here and the law lived only in this comment; r8 moved
      // it into Sketches.lshParamsFor where the gated queries use it.)
      val params = graft.ops.Sketches.lshParamsFor(nEmbs1 * n,
        graft.ops.Sketches.LshDemand.Threshold)
      val scope = graft.ops.CacheScope.begin(spark)
      time(s"scale x$n: lsh annPairs (nbits=${params.nbits} " +
          s"tables=${params.tables} probe=${params.probe})") {
        graft.ops.Sketches.annPairsAt(embsX(n), params).count()
      }
      scope.release()
      spark.sharedState.cacheManager.clearCache()
      val scope2b = graft.ops.CacheScope.begin(spark)
      time(s"scale x$n: minhash pairs") {
        graft.ops.Sketches.minhashNearDups(docsX(n), threshold = 0.5).count()
      }
      scope2b.release()
      spark.sharedState.cacheManager.clearCache()
      // Substring-dedup core (dedup_substring's window + first-occurrence
      // stages). The suffix-perturbed replicas are ADVERSARIAL here: a
      // replica shares almost every 10-word window with its original, so
      // at x8 nearly every window occurrence is a duplicate (gram groups
      // of 8). Cost must stay ~linear regardless - the first-occurrence
      // pass is one sort-window per gram partition, never a pair join.
      val scope2c = graft.ops.CacheScope.begin(spark)
      time(s"scale x$n: substring dedup stats") {
        graft.ops.SubstringDedup.windowDupStats(docsX(n), k = 10).count()
      }
      scope2c.release()
      spark.sharedState.cacheManager.clearCache()
      // IVF-PQ composite at the standard √N cell sizing (kCells ∝ √N
      // holds cell count and cell size both ~√N): per-query ADC
      // candidates rc·qp·N/kCells grow only √x, so the SEARCH side is
      // sublinear; the end-to-end number also carries the encode pass
      // (one linear map over the corpus — amortized index build in
      // production, rebuilt per run here). Anything pairwise would be
      // 64x at x8.
      val kc = math.max(16, math.round(16 * math.sqrt(n.toDouble)).toInt)
      val scope2d = graft.ops.CacheScope.begin(spark)
      time(s"scale x$n: ivfpq search (kCells=$kc)") {
        graft.ops.IvfPq.search(embsX(n), nq = 8, kCells = kc, rc = 3,
          qp = 6, m = 16, k = 16,
          shortlist = math.max(64, (nEmbs1 * n * 2 / 5).toInt), topK = 10)
          .count()
      }
      scope2d.release()
      spark.sharedState.cacheManager.clearCache()
    }
    // Adversarial gram skew: ~30% of documents are the SAME long
    // boilerplate — a 10-word sentence repeated 15 times, so its ~141
    // overlapping windows cycle through just 10 distinct grams. At x8
    // that is ~1.7M occurrences concentrated in 10 gram keys (vs ~0.6M
    // benign windows spread over ~0.5M keys). The one-shuffle window
    // path must sort every occurrence of a hot gram in a single window
    // task (AQE cannot split window partitions); the two-phase path
    // compresses each hot key to ONE row per map task in the partial
    // aggregate, and its join-back is an equi-join AQE can skew-split.
    //
    // MEASURED (r8, this box): parity within noise at x8 (0.40 vs
    // 0.42 s) AND x64 (2.38 vs 2.52 s — ~14M hot occurrences). At local
    // fixture sizes a single-task sort of the hot partition is
    // sub-second, so the straggler never surfaces; the two-phase path
    // costs nothing here and matters only at cluster scale, where a hot
    // partition is GBs (the window sort becomes one multi-minute task
    // while the partial agg stays one row per map task). The variant is
    // therefore offered as a switch, not the default.
    val boiler = Array.fill(15)(
      "boiler plate header repeated verbatim across many crawled pages today")
      .mkString(" ")
    def skewDocsX(n: Int) = docsX(n).select(col("doc_id"),
      when(col("doc_id") % 10 < 3, lit(boiler))
        .otherwise(col("text")).as("text"))
    // SKEW_X overrides the replication grid (e.g. SKEW_X=64 to push the
    // hot grams past local fixed-overhead noise).
    val skewXs = sys.env.get("SKEW_X")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 8))
    for (n <- skewXs; twoPhase <- Seq(false, true)) {
      val scope = graft.ops.CacheScope.begin(spark)
      time(s"skew x$n: substring dedup (twoPhase=$twoPhase)") {
        graft.ops.SubstringDedup.windowDupStats(skewDocsX(n), k = 10,
          twoPhaseFirst = twoPhase).count()
      }
      scope.release()
      spark.sharedState.cacheManager.clearCache()
    }

    // Round-9 claims, reproducible: (a) the staged IVF-PQ split — call 1
    // builds + writes the index to parquet, call 2 pays only the
    // probe/ADC/rerank side (the per-query cost a production deployment
    // sees); (b) dedup_containment end-to-end with the fingerprinted
    // (8-byte hashed) shingles + half-pair join.
    {
      val embsP = graft.Tables.embeddings(spark, sfDir)
      // Same shortlist law + footer-read source as the declared query —
      // the probe must reproduce the production parameterization exactly.
      val shortP = math.max(64L,
        (graft.Q.parquetRowCount(spark, s"$sfDir/embeddings.parquet") * 2 + 4) / 5).toInt
      for (call <- Seq("build+search", "search-only (staged)")) {
        val scope = graft.ops.CacheScope.begin(spark)
        time(s"ivfpq staged, call = $call") {
          graft.ops.IvfPq.searchStaged(embsP, tag = s"probe_$sfDir", nq = 8,
            kCells = 16, rc = 3, qp = 6, m = 16, k = 16,
            shortlist = shortP, topK = 10, refine = 1).count()
        }
        scope.release()
        spark.sharedState.cacheManager.clearCache()
      }
      val scopeC = graft.ops.CacheScope.begin(spark)
      time("dedup_containment end-to-end") {
        graft.SparkEntry.queries("dedup_containment")(spark, sfDir).count()
      }
      scopeC.release()
      spark.sharedState.cacheManager.clearCache()
    }

    // Round-10 (VERDICT r9 task 7): scaling exponents for the two gate
    // pipelines, measured on the EXACT declared shapes (containmentOf /
    // minhashMergeOf — not probe-local copies). Replicas here are
    // GRAM-DOMAIN-DISJOINT: every word gets a per-replica prefix, so a
    // replica shares NO shingles with its original — corpus grows x8
    // while true-pair density stays constant (the suffix-perturbed
    // replicas used above would be mutual near-CONTAINMENTS of their
    // originals, turning the probe into an adversarial 64x-more-real-
    // pairs dataset rather than a bigger one). Claims under test:
    //   - containment: the df cap + prefix-filter candidates keep cost
    //     ~linear in corpus size (the f² explosion never returns);
    //   - minhash-merge: per-gram fan-out is bounded by the SOURCE
    //     count, so the exact gate also scales ~linearly; replica
    //     sources stay distinct (sources x8 too — the 190-pair domain
    //     grows, but per-gram sets stay tiny).
    // MEASURED (r10, this box): containment 1.32 → 4.13 s at x8 (3.1×,
    // exponent ~0.55 — sublinear because fixed stage overheads still
    // dominate at fixture scale; a quadratic path would read 64×);
    // minhash-merge 2.00 → 3.48 s at x8 (1.7×, exponent ~0.27). Both
    // claims hold with wide margin.
    {
      val docsR = graft.Tables.documents(spark, sfDir)
        .select("doc_id", "source", "text")
      def disjointX(n: Int) = (0 until n).map { i =>
        docsR.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat(lit(s"r$i"), col("source")).as("source"),
          expr(s"array_join(transform(split(text, ' '), w -> concat('r$i', w)), ' ')")
            .as("text"))
      }.reduce(_ unionAll _)
      for (n <- Seq(1, 8)) {
        val sc1 = graft.ops.CacheScope.begin(spark)
        time(s"scale x$n: containment (prefix-filter)") {
          graft.queries.Extra9.containmentOf(
            disjointX(n).select("doc_id", "text"), prefilterDf = false).count()
        }
        sc1.release()
        spark.sharedState.cacheManager.clearCache()
        val sc2 = graft.ops.CacheScope.begin(spark)
        time(s"scale x$n: minhash-merge (exact gate + sketch)") {
          graft.queries.Extra10.minhashMergeOf(spark, disjointX(n)).count()
        }
        sc2.release()
        spark.sharedState.cacheManager.clearCache()
      }
    }

    // sql_q21 rewrite scaling: the correlated-subquery form the oracle
    // runs joins the fact to itself twice; the engine's one-rollup
    // rewrite should scale ~linearly in fact size. Replicas offset BOTH
    // orderkeys and suppkeys, so order populations (the per-order
    // supplier sets) replicate disjointly — QUALIFYING suppliers grow
    // 8x (the counted output stays 100: q21Of ends in limit(100), and
    // TakeOrderedAndProject still computes the full rollup it caps),
    // true per-order structure stays constant, and any superlinear term
    // would be the rewrite's own shuffles, not data adversariality.
    // MEASURED (r10, this box): 1.83 → 7.04 s at x8 (3.8×, exponent
    // ~0.65 — sublinear, fixed stage overheads still amortizing at
    // fixture scale; a per-branch fact re-join would read ~2× that,
    // a correlated NLJ 64×).
    // Bitmap page rollup (round-10): the claim is that after the one
    // id-carrying fact join, every exchange carries fixed-width pages —
    // so cost grows with input rows plus the (group × bucket) page
    // count, never with id-list width. Replicas shift custkeys by 1e6
    // per copy, so x8 grows rows 8×, distinct ids 8× AND the bucket
    // count ~8× (ids span ~245 buckets at x8 vs ~31 at x1 — the
    // multi-bucket path the fixture alone can't reach). A shape that
    // shuffled raw id lists (collect_set-style) would carry 8× wider
    // rows through every exchange on top of the 8× row count.
    // MEASURED (r10, this box, sf0.1): 0.27 → 0.55 s at x8 (2.0×,
    // exponent ~0.34 — the pages really are the cost ceiling; fixed
    // stage overheads still amortizing).
    {
      val or0 = graft.Tables.orders(spark, sfDir)
        .select("o_custkey", "o_orderdate")
      def cohortsX(n: Int) = (0 until n).map { i =>
        or0.select((col("o_custkey") + lit(i * 1000000L)).as("id"),
          when(expr("unix_timestamp(o_orderdate) % 2 = 0"), 1996)
            .otherwise(1997).as("yr"),
          (pmod(col("o_custkey"), lit(5))).cast("string").as("grp"))
      }.reduce(_ unionAll _)
      for (n <- Seq(1, 8)) {
        val sc = graft.ops.CacheScope.begin(spark)
        time(s"scale x$n: bitmap intersect rollup") {
          graft.queries.Extra13.bitmapIntersectOf(
            cohortsX(n).select("grp", "yr", "id"), 1996, 1997).count()
        }
        sc.release()
        spark.sharedState.cacheManager.clearCache()
      }
    }

    {
      val li1 = graft.Tables.lineitem(spark, sfDir)
      val or1 = graft.Tables.orders(spark, sfDir)
      def liX(n: Int) = (0 until n).map { i =>
        li1.select((col("l_orderkey") + lit(i * 100000000L)).as("l_orderkey"),
          (col("l_suppkey") + lit(i * 10000000L)).as("l_suppkey"),
          col("l_shipdate"))
      }.reduce(_ unionAll _)
      def orX(n: Int) = (0 until n).map { i =>
        or1.select((col("o_orderkey") + lit(i * 100000000L)).as("o_orderkey"),
          col("o_orderdate"))
      }.reduce(_ unionAll _)
      for (n <- Seq(1, 8)) {
        val sc = graft.ops.CacheScope.begin(spark)
        time(s"scale x$n: sql_q21 rewrite") {
          graft.queries.Extra12.q21Of(liX(n), orX(n)).count()
        }
        sc.release()
        spark.sharedState.cacheManager.clearCache()
      }
    }

    // text_bpe_pairs vocab compression: the claim is that pair counting
    // runs on the frequency-compressed VOCABULARY, so corpus growth
    // that doesn't grow the vocabulary only pays the word-count rollup
    // (map-side combine over more rows), while the pair explosion and
    // everything after it stay CONSTANT-sized. Plain x8 replication
    // (same text, offset ids) grows rows 8x with the vocab fixed —
    // near-flat cost is the claim holding; contrast the r-prefixed
    // disjoint replicas above, which grow the vocab 8x and would grow
    // the pair stage with it.
    // MEASURED (r10, this box, sf0.1): 0.45 → 0.37 s at x8 (~1.0×,
    // exponent ~0 — flat: the 8× word-count scan disappears into
    // map-side combine and the pair stage is vocab-bound as claimed;
    // the x1 sample carries the stage-warmup cost).
    {
      val d0 = graft.Tables.documents(spark, sfDir).select("text")
      def plainX(n: Int) = (0 until n).map(_ => d0).reduce(_ unionAll _)
      for (n <- Seq(1, 8)) {
        val sc = graft.ops.CacheScope.begin(spark)
        time(s"scale x$n: bpe pairs (fixed vocab)") {
          graft.queries.Extra16.bpePairsOf(plainX(n)).count()
        }
        sc.release()
        spark.sharedState.cacheManager.clearCache()
      }
    }
    // join_spatial grid join: the claim is that candidates scale with
    // probes × (9 · cell occupancy), never |S|·|C|. Replicas shift
    // longitude by 40° per copy — DISJOINT grid regions, so x8 grows
    // both sides 8× at CONSTANT density (folding replicas onto the
    // same cells would instead multiply per-cell occupancy — the
    // quadratic direction, like the suffix-perturbed dedup replicas).
    // Linear-ish growth = the grid is doing its job; an all-pairs plan
    // would read 64×.
    // MEASURED (r10, this box, sf0.1): 0.37 → 1.20 s at x8 (3.2×,
    // exponent ~0.56 — sublinear, fixed stage overheads still
    // amortizing at fixture scale). Claim holds with wide margin.
    {
      val su = graft.Tables.supplier(spark, sfDir).select(col("s_suppkey"),
        (col("s_suppkey") % 10 - 4.5).as("lat"),
        ((col("s_suppkey") * 11) % 40 - 19.5).as("lon"))
      val cu = graft.Tables.customer(spark, sfDir).select(col("c_custkey"),
        (col("c_custkey") % 10 - 4.5).as("lat"),
        ((col("c_custkey") * 7) % 40 - 19.5).as("lon"))
      def shiftX(df: org.apache.spark.sql.DataFrame, key: String, n: Int) =
        (0 until n).map { i =>
          df.select((col(key) + lit(i * 10000000L)).as(key), col("lat"),
            (col("lon") + lit(i * 40.0)).as("lon"))
        }.reduce(_ unionAll _)
      for (n <- Seq(1, 8)) {
        val sc = graft.ops.CacheScope.begin(spark)
        time(s"scale x$n: spatial grid join") {
          graft.queries.Extra20.spatialPairsOf(
            shiftX(su, "s_suppkey", n), shiftX(cu, "c_custkey", n)).count()
        }
        sc.release()
        spark.sharedState.cacheManager.clearCache()
      }
    }

    // agg_cooccur basket pairs: the claim is cost ∝ baskets (fan-out
    // bounded by basket size², never table size). Replicas offset BOTH
    // orderkeys and partkeys — disjoint baskets AND disjoint pairs, so
    // x8 grows rows, baskets, and the distinct-pair domain 8× with
    // per-basket structure constant. Any superlinearity would be the
    // shape's own shuffles, not data adversariality.
    // MEASURED (r10, this box, sf0.1): 1.59 → 2.85 s at x8 (1.8×,
    // exponent ~0.28 — the basket shuffle and pair count really are
    // the only moving parts; fixed overheads dominate at x1).
    {
      val li2 = graft.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey")
      def liPX(n: Int) = (0 until n).map { i =>
        li2.select((col("l_orderkey") + lit(i * 100000000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i * 10000000L)).as("l_partkey"))
      }.reduce(_ unionAll _)
      for (n <- Seq(1, 8)) {
        val sc = graft.ops.CacheScope.begin(spark)
        time(s"scale x$n: cooccur basket pairs") {
          graft.queries.Extra20.cooccurOf(liPX(n)).count()
        }
        sc.release()
        spark.sharedState.cacheManager.clearCache()
      }
    }
    // eval_confusion: the claim is linear in corpus size — the centroid
    // table stays 10×64 however big the corpus (labels are the fixed
    // class domain), so x8 replicas with offset vec_ids and UNCHANGED
    // labels grow only the broadcast-join probe side and the
    // map-collapsed rollup. Superlinearity would mean the argmin or
    // distance stage is shuffling something corpus-sized.
    // MEASURED (r10, this box, sf0.1): 1.55 → 2.13 s at x8 (1.4×,
    // exponent ~0.15 — fixed stage overheads dominate; the data work
    // is a rounding error even at x8).
    {
      val e0 = graft.Tables.embeddings(spark, sfDir)
      def embX(n: Int) = (0 until n).map { i =>
        e0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionAll _)
      for (n <- Seq(1, 8)) {
        val sc = graft.ops.CacheScope.begin(spark)
        time(s"scale x$n: confusion matrix") {
          graft.queries.Extra21.confusionOf(embX(n)).count()
        }
        sc.release()
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
