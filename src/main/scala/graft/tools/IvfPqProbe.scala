package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.graft.{native => gn}

/** A/B of sim_ann_ivfpq's warm-path query side (the Q21Probe method:
  * both forms inline, interleaved in ONE JVM with a calibration query
  * before every sample, because this box's ambient speed swings ±40%).
  * OLD = assignTo (crossJoin → rank rollup → posexplode) then joins
  * BACK to queries and centroids to re-attach qe/cvec; NEW = the
  * folded form shipped in [[graft.ops.IvfPq.searchIndexD]] — qe and
  * cvec ride the rank rollup, no re-attach joins.
  *
  * MEASURED (r12, this box, local[32], sf0.1, staged index,
  * interleaved blocks, ignoring load-spiked samples — calib shown
  * per-sample): OLD warm min 1.19 s (range 1.19–3.98 + one 38 s
  * ambient spike), NEW warm min 0.71 s (range 0.71–1.84). The two
  * dropped broadcast builds + join stages are worth ~0.3–0.5 s of
  * fixed stage latency here; results byte-identical (n=80).
  *
  * Run: sbt -batch "runMain graft.tools.IvfPqProbe"
  */
object IvfPqProbe {
  def subvecsR(res: DataFrame, idCols: Seq[String], m: Int, sub: Int): DataFrame =
    res.select(idCols.map(col) :+ explode(expr(
      s"transform(sequence(0, ${m - 1}), j -> struct(j AS j, slice(resid, j * $sub + 1, $sub) AS sv))"))
      .as("x"): _*)
      .select(idCols.map(col) :+ col("x.j").as("j") :+ col("x.sv").as("sv"): _*)

  def tail(embs: DataFrame, queries: DataFrame, qcells: DataFrame, cb: DataFrame,
      codes: DataFrame, m: Int, sub: Int, shortlist: Int, topK: Int): DataFrame = {
    val lut = subvecsR(qcells, Seq("q_id", "cid"), m, sub)
      .join(broadcast(cb), "j")
      .select(col("q_id"), col("cid"), col("j"), col("ccode").as("code"),
        graft.ops.Lloyd.l2sq(col("sv"), col("cbvec")).cast(DecimalType(18, 9)).as("contrib"))
    val adc = codes.join(broadcast(lut), Seq("cid", "j", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id", "cid").agg(sum("contrib").as("d2cell"))
      .groupBy("q_id", "vec_id").agg(min("d2cell").as("approx_d2"))
    val short = gn.top_k_per_group(adc, Seq("q_id"),
      Seq(col("approx_d2").asc, col("vec_id").asc), shortlist)
    val reranked = short.join(broadcast(queries), "q_id")
      .join(embs.select(col("vec_id"), col("embedding").as("xe")), "vec_id")
      .select(col("q_id"), col("vec_id").as("nb_id"),
        round(gn.cosine_similarity(col("qe"), col("xe")), 4)
          .cast(DecimalType(18, 4)).as("sim"))
    gn.top_k_per_group(reranked, Seq("q_id"),
      Seq(col("sim").desc, col("nb_id").asc), topK)
      .orderBy(col("q_id"), col("sim").desc, col("nb_id"))
  }
  def qcellsOld(queries: DataFrame, cents: DataFrame, qp: Int): DataFrame = {
    val qasg = graft.ops.IvfIndex.assignTo(
      queries.select(col("q_id").as("vec_id"), col("qe").as("embedding")),
      cents, nProbe = qp)
    qasg.join(broadcast(queries), col("vec_id") === col("q_id"))
      .filter(col("probe_rank") <= qp)
      .join(broadcast(cents), "cid")
      .select(col("q_id"), col("cid"),
        zip_with(col("qe"), col("cvec"), (x, y) => x - y).as("resid"))
  }
  def qcellsNew(queries: DataFrame, cents: DataFrame, qp: Int): DataFrame =
    queries.crossJoin(broadcast(cents))
      .select(col("q_id"), col("qe"),
        struct((-gn.cosine_similarity(col("qe"), col("cvec"))).as("negsim"),
          col("cid").as("cid"), col("cvec").as("cvec")).as("cand"))
      .groupBy("q_id")
      .agg(first(col("qe")).as("qe"),
        slice(array_sort(collect_list(col("cand"))), 1, qp).as("top"))
      .select(col("q_id"), col("qe"), explode(col("top")).as("c"))
      .select(col("q_id"), col("c.cid").as("cid"),
        zip_with(col("qe"), col("c.cvec"), (x, y) => x - y).as("resid"))

  def main(a: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = graft.Tables.embeddings(spark, d)
    val (kCells, rc, qp, m, k) = (16, 3, 6, 16, 16)
    val short = math.max(64L,
      (graft.Q.parquetRowCount(spark, s"$d/embeddings.parquet") * 2 + 4) / 5).toInt
    // build + stage frames once (use the search() builder, persist to parquet like staged path)
    val (cents0, cb0, codes0) = graft.ops.IvfPq.buildIndex(embs, kCells, rc, m, k, refine = 1)
    val dir = "/tmp/tmp_ivfpq_ab"
    cents0.write.mode("overwrite").parquet(s"$dir/cents")
    cb0.write.mode("overwrite").parquet(s"$dir/cb")
    codes0.write.mode("overwrite").parquet(s"$dir/codes")
    val cents = spark.read.parquet(s"$dir/cents")
    val cb = spark.read.parquet(s"$dir/cb")
    val codes = spark.read.parquet(s"$dir/codes")
    val dDim = 64
    val sub = dDim / m
    def queries() = embs.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    def mkOld() = { val q = queries(); tail(embs, q, qcellsOld(q, cents, qp), cb, codes, m, sub, short, 10) }
    def mkNew() = { val q = queries(); tail(embs, q, qcellsNew(q, cents, qp), cb, codes, m, sub, short, 10) }
    val calibFn = graft.SparkEntry.queries("agg_pricing")
    mkOld().count(); mkNew().count() // JIT both
    def run(label: String, mk: () => DataFrame): Unit = (1 to 3).foreach { i =>
      val scope = graft.ops.CacheScope.begin(spark)
      val t0c = System.nanoTime(); calibFn(spark, d).count()
      val dtc = (System.nanoTime() - t0c) / 1e9
      val t0 = System.nanoTime(); mk().count()
      val dt = (System.nanoTime() - t0) / 1e9
      scope.release(); spark.sharedState.cacheManager.clearCache()
      println(f"[ab] $label pass $i: $dt%.3f s (calib $dtc%.3f)")
    }
    run("OLD-a", mkOld); run("NEW-a", mkNew)
    run("OLD-b", mkOld); run("NEW-b", mkNew)
    val r1 = mkOld().collect().map(_.toString).toSeq
    val r2 = mkNew().collect().map(_.toString).toSeq
    println(s"[ab] equal: ${r1 == r2}, n=${r1.size}")
    spark.stop()
  }
}
