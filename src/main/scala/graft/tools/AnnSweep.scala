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
      println(s"== $d truth=${truth.size}")
      for (nbits <- Seq(3, 4); tables <- Seq(16, 24, 32)) {
        val t0 = System.nanoTime()
        val got = top20(graft.ops.Sketches.annPairs(embs, nbits, tables))
        val rec = (truth & got).size
        println(f"LSH nbits=$nbits tables=$tables%2d recall=$rec/20 " +
          f"miss=${(truth -- got).size} t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      for (k <- Seq(8, 16); nProbe <- Seq(3, 4); refine <- Seq(0, 1)) {
        val t0 = System.nanoTime()
        val got = top20(graft.ops.IvfIndex.annPairs(embs, k, nProbe, refine = refine))
        val rec = (truth & got).size
        println(f"IVF k=$k%2d nProbe=$nProbe refine=$refine recall=$rec/20 " +
          f"miss=${(truth -- got).size} t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
    }
    spark.stop()
  }
}
