package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline tuning harness for the two ANN paths: sweeps LSH
  * (nbits × tables) and IVF (k × nProbe × refine) parameter grids and
  * prints top-20 recall against the exact brute-force pair ranking, per
  * SF dir given on the command line. Used to pick parameters where
  * recall is 100% on the bench fixtures so `sim_ann_lsh` /
  * `sim_ann_ivf` can carry a ground-truth (brute-force top-k) oracle —
  * not part of the declared query surface.
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def top20(df: DataFrame): Set[(Long, Long)] =
      df.orderBy(col("sim").desc, col("id1"), col("id2")).limit(20)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // Section filter for quick re-sweeps (e.g. SWEEP_SECTIONS=lsh,thr).
    val sections = sys.env.get("SWEEP_SECTIONS")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("lsh", "thr", "pq", "ivf", "ivfpq", "int8", "fann", "fann2"))
    def intsEnv(name: String, dflt: Seq[Int]): Seq[Int] =
      sys.env.get(name).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(dflt)
    val nbitsGrid = intsEnv("SWEEP_NBITS", Seq(4, 6))
    val tablesGrid = intsEnv("SWEEP_TABLES",
      Seq(4, 6, 8, 10, 12, 14, 16, 20, 24, 26, 28, 30))
    val probeGrid = intsEnv("SWEEP_PROBE", Seq(0, 1))

    dirs.foreach { d =>
      val embs = graft.Tables.embeddings(spark, d)
      // exact ranking via the brute pair join (fixtures are <= 2k vectors)
      val e = embs.select(col("vec_id"), col("embedding"))
      val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
      val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"))
      val brute = a.join(broadcast(b), col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(org.apache.spark.sql.graft.native.cosine_similarity(
            col("e1"), col("e2")), 4).as("sim"))
      val truth = top20(brute)
      val nAll = brute.count()
      println(s"== $d truth=${truth.size} all_pairs=$nAll")
      // cands/all is the efficiency axis: an "ANN" config admitting ~all
      // pairs is brute force with extra steps — the sweep optimizes for
      // 20/20 recall (with a margin notch) at the LOWEST candidate frac.
      if (sections("lsh"))
      for (probe <- probeGrid; nbits <- nbitsGrid; tables <- tablesGrid) {
        val t0 = System.nanoTime()
        val res = graft.ops.Sketches.annPairs(embs, nbits, tables, probe = probe)
        val (got, nc) = (top20(res), res.count())
        val rec = (truth & got).size
        println(f"LSH probe=$probe nbits=$nbits tables=$tables%2d recall=$rec/20 " +
          f"miss=${(truth -- got).size} cands=$nc%7d (${100.0 * nc / nAll}%5.1f%%) " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      // Threshold recall (the dedup_semantic gate shape): of the exact
      // pairs at rounded cosine >= tau, how many appear among the LSH
      // candidates? The gate needs 100% — sweep tau x tables for the
      // edge. One brute collect per tau and ONE annPairs run per tables
      // value (tau is only a post-filter on the exact side; candidate
      // membership is tau-independent).
      val taus = Seq(0.40, 0.42, 0.44, 0.45)
      // Gated with its section: four brute collects per fixture are
      // exactly the wall-clock a SWEEP_SECTIONS=lsh re-sweep skips.
      lazy val exactByTau = taus.map { tau =>
        tau -> brute.filter(col("sim") >= tau)
          .select("id1", "id2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }.toMap
      if (sections("thr"))
      for (probe <- probeGrid; nbits <- nbitsGrid; tables <- tablesGrid) {
        val cand = graft.ops.Sketches.annPairs(embs, nbits, tables, probe = probe)
          .select("id1", "id2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        for (tau <- taus) {
          val exact = exactByTau(tau)
          println(f"THR tau=$tau probe=$probe nbits=$nbits tables=$tables%2d " +
            f"exact=${exact.size}%4d miss=${(exact -- cand).size}%3d " +
            f"cands=${cand.size}%7d (${100.0 * cand.size / nAll}%5.1f%%)")
        }
      }
      // PQ: per-query top-10 EXACT match (rounded-sim total order) vs
      // brute force — containment demands the ADC shortlist covers the
      // true top-10 for every query.
      lazy val qtruth = {
        // Same orderBy(vec_id).limit(8) query set as the searchers
        // being swept (the ftruth fix below, applied here too).
        val q = e.orderBy("vec_id").limit(8)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val pairsQ = q.join(broadcast(e.select(col("vec_id").as("nb_id"), col("embedding").as("xe"))),
          col("nb_id") =!= col("q_id"))
          .select(col("q_id"), col("nb_id"),
            round(org.apache.spark.sql.graft.native.cosine_similarity(
              col("qe"), col("xe")), 4).as("sim"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("nb_id"))
        pairsQ.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
          .select("q_id", "nb_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val nCorpus = embs.count()
      if (sections("pq"))
      for (m <- Seq(8, 16); sFrac <- Seq(10, 20, 30, 40, 50); rounds <- Seq(0, 1)) {
        val s = (nCorpus * sFrac / 100).toInt
        val t0 = System.nanoTime()
        val got = graft.ops.PqIndex.search(embs, nq = 8, m = m, k = 16,
          rounds = rounds, shortlist = s, topK = 10)
          .select("q_id", "nb_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"PQ m=$m%2d k=16 rounds=$rounds S=$s%4d ($sFrac%2d%%) " +
          f"match=${(qtruth & got).size}/${qtruth.size} " +
          f"miss=${(qtruth -- got).size} t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      // IVF-PQ: same per-query top-10 containment gate as PQ, but the
      // ADC only touches probed cells — sweep (rc × qp × shortlist
      // fraction) for the containment edge at the lowest probed-cell +
      // shortlist budget.
      if (sections("ivfpq"))
      for (rc <- intsEnv("SWEEP_RC", Seq(1, 2));
           qp <- intsEnv("SWEEP_QP", Seq(4, 5, 6));
           refine <- intsEnv("SWEEP_REFINE", Seq(1));
           sFrac <- intsEnv("SWEEP_SFRAC", Seq(20, 35, 50))) {
        val s = math.max(1, (nCorpus * sFrac / 100).toInt)
        val t0 = System.nanoTime()
        val got = graft.ops.IvfPq.search(embs, nq = 8, kCells = 16, rc = rc,
          qp = qp, m = 16, k = 16, shortlist = s, topK = 10, refine = refine)
          .select("q_id", "nb_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"IVFPQ kCells=16 rc=$rc qp=$qp refine=$refine S=$s%4d ($sFrac%2d%%) " +
          f"match=${(qtruth & got).size}/${qtruth.size} " +
          f"miss=${(qtruth -- got).size} t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      // IVF-SQ8: per-query top-10 containment like PQ/IVFPQ, candidates
      // scored on int8 codes — sweep (rc × qp × shortlist fraction) for
      // the containment edge at the lowest probe + shortlist budget.
      if (sections("int8"))
      for (rc <- intsEnv("SWEEP_RC", Seq(2, 3));
           qp <- intsEnv("SWEEP_QP", Seq(4, 5, 6, 7));
           sFrac <- intsEnv("SWEEP_SFRAC", Seq(10, 15, 20, 25, 35))) {
        val s = math.max(1, (nCorpus * sFrac / 100).toInt)
        val t0 = System.nanoTime()
        val got = graft.ops.Int8Index.search(embs, nq = 8, kCells = 16,
          rc = rc, qp = qp, shortlist = s, topK = 10, refine = 1)
          .select("q_id", "nb_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"INT8 kCells=16 rc=$rc qp=$qp S=$s%4d ($sFrac%2d%%) " +
          f"match=${(qtruth & got).size}/${qtruth.size} " +
          f"miss=${(qtruth -- got).size} t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      // Filtered ANN (sim_ann_filtered): per-query top-10 among label=1
      // vectors only, served from the int8 index with the label carried
      // as meta and pre-filtered at the candidate level. The filtered
      // truth is a DIFFERENT (farther) top-10 than qtruth, so the
      // containment edge sits at wider probing than the unfiltered
      // sibling — the sweep measures where.
      lazy val ftruth = {
        // Query set = the SAME orderBy(vec_id).limit(8) the declared
        // path (Int8Index.searchIndex) uses — a `vec_id < 8` filter
        // would measure a different query set on any fixture whose ids
        // are non-contiguous or non-zero-based (ADVICE r13).
        val q = e.orderBy("vec_id").limit(8)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val cand = graft.Tables.embeddings(spark, d)
          .filter(col("label") === 1)
          .select(col("vec_id").as("nb_id"), col("embedding").as("xe"))
        val pairsQ = q.join(broadcast(cand), col("nb_id") =!= col("q_id"))
          .select(col("q_id"), col("nb_id"),
            round(org.apache.spark.sql.graft.native.cosine_similarity(
              col("qe"), col("xe")), 4).as("sim"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("nb_id"))
        pairsQ.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
          .select("q_id", "nb_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      if (sections("fann"))
      for (rc <- intsEnv("SWEEP_RC", Seq(3, 4));
           qp <- intsEnv("SWEEP_QP", Seq(7, 8, 9, 10, 11))) {
        val s = math.max(64, (nCorpus / 4).toInt)
        val t0 = System.nanoTime()
        val got = graft.ops.Int8Index.search(embs, nq = 8, kCells = 16,
          rc = rc, qp = qp, shortlist = s, topK = 10, refine = 1,
          meta = Seq("label"), candFilter = Some(col("label") === 1))
          .select("q_id", "nb_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"FANN kCells=16 rc=$rc qp=$qp S=$s%4d " +
          f"match=${(ftruth & got).size}/${ftruth.size} " +
          f"miss=${(ftruth -- got).size} t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      // Conjunctive-filtered ANN (sim_ann_filtered2, r14): predicate
      // label = 1 AND n_chars ∈ [200, 400] over TWO metadata columns of
      // different provenance (the embedding table's label + the
      // documents table's n_chars, denormalized into the code rows at
      // build — the FAISS IDSelector / vector-store `filter` contract
      // generalized to a conjunction). Selectivity ~4% (19/24/75
      // admissible at the three fixtures) — tighter than label-only's
      // ~9%, so the edge sits at wider probing still; the sweep
      // measures where.
      lazy val embsMeta = graft.Tables.embeddings(spark, d)
        .join(broadcast(graft.Tables.documents(spark, d)
          .select(col("doc_id").as("vec_id"), col("n_chars"))), "vec_id")
      lazy val conjPred = col("label") === 1 &&
        col("n_chars").between(200, 400)
      lazy val f2truth = {
        val q = e.orderBy("vec_id").limit(8)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val cand = embsMeta.filter(conjPred)
          .select(col("vec_id").as("nb_id"), col("embedding").as("xe"))
        val pairsQ = q.join(broadcast(cand), col("nb_id") =!= col("q_id"))
          .select(col("q_id"), col("nb_id"),
            round(org.apache.spark.sql.graft.native.cosine_similarity(
              col("qe"), col("xe")), 4).as("sim"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("nb_id"))
        pairsQ.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
          .select("q_id", "nb_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      if (sections("fann2"))
      for (rc <- intsEnv("SWEEP_RC", Seq(3, 4, 5));
           qp <- intsEnv("SWEEP_QP", Seq(9, 10, 11, 12, 13, 14))) {
        val s = math.max(64, (nCorpus / 4).toInt)
        val t0 = System.nanoTime()
        val got = graft.ops.Int8Index.search(embsMeta, nq = 8, kCells = 16,
          rc = rc, qp = qp, shortlist = s, topK = 10, refine = 1,
          meta = Seq("label", "n_chars"), candFilter = Some(conjPred))
          .select("q_id", "nb_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"FANN2 kCells=16 rc=$rc qp=$qp S=$s%4d " +
          f"match=${(f2truth & got).size}/${f2truth.size} " +
          f"miss=${(f2truth -- got).size} t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      if (sections("ivf"))
      for (k <- Seq(8, 16, 32, 64); nProbe <- Seq(2, 3, 4, 5); refine <- Seq(0, 1)) {
        val t0 = System.nanoTime()
        val res = graft.ops.IvfIndex.annPairs(embs, k, nProbe, refine = refine)
        val (got, nc) = (top20(res), res.count())
        val rec = (truth & got).size
        println(f"IVF k=$k%2d nProbe=$nProbe refine=$refine recall=$rec/20 " +
          f"miss=${(truth -- got).size} cands=$nc%7d (${100.0 * nc / nAll}%5.1f%%) " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
    }
    spark.stop()
  }
}
