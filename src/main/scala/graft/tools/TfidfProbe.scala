package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** Same-session A/B for text_tfidf's stage count (VERDICT r12 #5, the
  * ContainProbe method: byte-equality gate + interleaved timings so
  * host drift can't masquerade as a win).
  *
  *   A (r12 shipped): explode → two-phase tf on (doc,word) → df
  *     broadcast → row_number window on doc_id → filter rn<=3.
  *     Exchanges: (doc,word) agg, doc_id window, word df, output sort.
  *   B (r13 candidate): ONE up-front spreadBy(doc_id) of the RAW docs,
  *     then everything doc-side is exchange-free — HashPartitioning
  *     (doc_id) satisfies the (doc_id, word) grouping AND the top-k
  *     clustering (subset rule) — and the window is replaced by the
  *     bounded-heap TopKPerGroup exec. Exchanges: raw docs, word df,
  *     output sort.
  *
  * MEASURED (this box, r13, sf0.1, alternated A/B/A/B ×4, min):
  * A min 1.03 / B min 0.81 s — outputs byte-equal; B shipped. The win
  * is the deleted (doc,word)+window exchange pair; at 100 TB the trade
  * (shuffle raw text once vs shuffle tf partials twice + sort) holds
  * as long as per-doc distinct-word bytes ≈ text bytes, which Heaps'
  * law gives for natural text.
  */
object TfidfProbe {
  def variantA(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct("doc_id").as("n"))
    val byScore = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("word"))
    tf.join(broadcast(df), "word").crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"),
        round(col("tf") * log(col("n").cast("double") / col("df")), 6)
          .cast(DecimalType(18, 6)).as("score"))
      .withColumn("rn", row_number().over(byScore))
      .filter(col("rn") <= 3)
      .select("doc_id", "word", "score")
      .orderBy("doc_id", "word")
  }

  def variantB(docs: DataFrame): DataFrame = {
    val gn = org.apache.spark.sql.graft.native
    val spread = graft.Q.spreadBy(docs.select("doc_id", "text"), "doc_id")
    val words = spread
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct("doc_id").as("n"))
    val sc = tf.join(broadcast(df), "word").crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"),
        round(col("tf") * log(col("n").cast("double") / col("df")), 6)
          .cast(DecimalType(18, 6)).as("score"))
    gn.top_k_per_group(sc, Seq("doc_id"),
        Seq(col("score").desc, col("word").asc), 3)
      .select("doc_id", "word", "score")
      .orderBy("doc_id", "word")
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sf)
    val a = variantA(docs).collect().map(_.toString).toSeq
    val b = variantB(docs).collect().map(_.toString).toSeq
    println(s"byte-equal = ${a == b} (A ${a.size} rows, B ${b.size} rows)")
    require(a == b, "variants diverge — do not ship")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val ta = scala.collection.mutable.ArrayBuffer[Double]()
    val tb = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to 4).foreach { i =>
      ta += time(variantA(docs).count())
      tb += time(variantB(docs).count())
    }
    println(f"A times=${ta.map(t => f"$t%.2f").mkString("/")} min=${ta.min}%.2f")
    println(f"B times=${tb.map(t => f"$t%.2f").mkString("/")} min=${tb.min}%.2f")
    println("== plan B ==")
    val dfB = variantB(docs); dfB.collect()
    println(dfB.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0))
    spark.stop()
  }
}
