package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-level timing of graph_louvain1's pipeline (r16): which of the
  * sequential materializations carries the 4.8 s warm cost? Each step
  * is timed as an incremental count() on top of the previous cut
  * state, mirroring louvain1Of's structure exactly.
  * Usage: sbt -batch "runMain graft.tools.LouvainProbe [sfDir]"
  */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[louvain] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // Stage once (outside any timed step), then run the steps twice —
    // the second round is the warm profile the bench's min sees.
    val lab0 = graft.queries.Extra24.stagedLpaLabels(spark, d).toDF("node", "label")
    val e0 = spark.table(graft.queries.Extra23.stagedGraphEdges(spark, d)).select("u", "v")
    lab0.count(); e0.count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val lab = lab0
      val e = e0
      val elab = t("elab ckpt") {
        val x = e.join(graft.queries.Extra24.labelSide(lab, "u", "lu"), "u")
          .join(graft.queries.Extra24.labelSide(lab, "v", "lv"), "v")
          .localCheckpoint(false)
        x.count(); x
      }
      val m2i = t("m2i") {
        val x = elab.agg(count(lit(1)).as("m2"),
          sum(when(col("lu") === col("lv"), 1L).otherwise(0L)).as("intra_b"))
        x.count(); x
      }
      val degl = t("degl ckpt") {
        val x = elab.groupBy("u", "lu").agg(count(lit(1)).as("ki"))
          .localCheckpoint(false)
        x.count(); x
      }
      val dc = t("dc ckpt") {
        val x = degl.groupBy("lu").agg(sum("ki").as("dcv")).localCheckpoint(false)
        x.count(); x
      }
      val nc = t("nc ckpt") {
        val x = elab.groupBy(col("u").as("node"), col("lv").as("nlab"))
          .agg(count(lit(1)).as("k")).localCheckpoint(false)
        x.count(); x
      }
      val base = t("base ckpt") {
        val x = degl.select(col("u").as("node"), col("lu").as("a"), col("ki"))
          .join(broadcast(dc.select(col("lu").as("a"), col("dcv").as("da"))), "a")
          .join(nc.select(col("node"), col("nlab").as("a"), col("k").as("ka")),
            Seq("node", "a"), "left")
          .na.fill(0L, Seq("ka"))
          .localCheckpoint(false)
        x.count(); x
      }
      val mv = t("cand+mv ckpt") {
        val cand = base
          .join(nc.select(col("node"), col("nlab").as("bl"), col("k")), "node")
          .filter(col("bl") =!= col("a"))
          .join(broadcast(dc.select(col("lu").as("bl"), col("dcv").as("db"))), "bl")
          .crossJoin(broadcast(m2i.select("m2")))
          .withColumn("delta", (col("k") - col("ka")) * col("m2")
            - col("ki") * (col("db") - col("da") + col("ki")))
        val gn = org.apache.spark.sql.graft.native
        val x = gn.top_k_per_group(cand, Seq("node"),
          Seq(col("delta").desc, col("bl").asc), 1).localCheckpoint(false)
        x.count(); x
      }
      val l4 = t("l4 ckpt") {
        val x = base
          .join(mv.select(col("node"), col("bl"), col("delta")), Seq("node"), "left")
          .select(col("node"),
            when(col("delta") > 0, col("bl")).otherwise(col("a")).as("label"))
          .localCheckpoint(false)
        x.count(); x
      }
      t("moves")(mv.filter(col("delta") > 0)
        .agg(count(lit(1)), coalesce(sum("delta"), lit(0L))).count())
      t("intraA")(elab.join(graft.queries.Extra24.labelSide(l4, "u", "l4u"), "u")
        .join(graft.queries.Extra24.labelSide(l4, "v", "l4v"), "v")
        .agg(sum(when(col("l4u") === col("l4v"), 1L).otherwise(0L))).count())
      t("sqA")(degl.select(col("u").as("node"), col("ki"))
        .join(graft.queries.Extra24.labelSide(l4, "node", "la"), "node")
        .groupBy("la").agg(sum("ki").as("dcv"))
        .agg(sum(col("dcv") * col("dcv"))).count())
    }
    spark.stop()
  }
}
