package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis library ops (SURVEY §2.10 [N]) behind the declared
  * queries: marker-profile language ID with argmax classification,
  * composite quality scoring, token counting. All pure column
  * expressions; the score components are also exposed as declared
  * oracle-checked queries (text_langid, text_quality, text_token_count).
  */
object TextAnalysis {

  /** Marker vocabularies per language tag (n-gram-profile reduction). */
  val defaultMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("vector", "value", "fast"),
    "en" -> Seq("key", "agg", "row"),
    "es" -> Seq("merge", "group", "hash"),
    "fr" -> Seq("scan", "spark", "join"),
    "zh" -> Seq("query", "small", "customer"))

  /** SQL string literal with quotes doubled — marker/stopword lists are
    * spliced into expr() text, so an apostrophe in a caller-supplied
    * word must not terminate the literal (parse failure at best,
    * expression injection at worst).
    */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def score(textCol: String, markers: Seq[String]): Column = {
    val arr = markers.map(sqlLit).mkString(",")
    expr(s"size(array_intersect(array_distinct(split($textCol, ' ')), array($arr)))")
  }

  /** Adds `lang_guess`: argmax marker score, ties to the alphabetically
    * first language (deterministic).
    */
  def withLangGuess(docs: DataFrame, textCol: String = "text",
      markers: Map[String, Seq[String]] = defaultMarkers): DataFrame = {
    val langs = markers.keys.toSeq.sorted
    val scored = markers.foldLeft(docs) { case (df, (lang, ms)) =>
      df.withColumn(s"_s_$lang", score(textCol, ms))
    }
    val best = langs.map(l => col(s"_s_$l")) // max over scores
    val guess = langs.foldLeft(lit(null).cast("string")) { (acc, l) =>
      // first (alphabetical) language achieving the max wins
      when(acc.isNull && col(s"_s_$l") === greatest(best: _*), lit(l)).otherwise(acc)
    }
    langs.foldLeft(scored.withColumn("lang_guess", guess)) { (df, l) =>
      df.drop(s"_s_$l")
    }
  }

  /** Composite quality score in [0, 100]: length band + stopword presence
    * + average word length sanity — the usual cheap pretraining-corpus
    * heuristics, integer arithmetic only (deterministic).
    */
  def withQualityScore(docs: DataFrame, textCol: String = "text",
      stopWords: Seq[String] = Seq("the", "a", "dup", "value", "table")): DataFrame = {
    val words = split(col(textCol), " ")
    val nWords = size(words)
    val inList = stopWords.map(sqlLit).mkString(",")
    val stopN = expr(s"size(filter(split($textCol, ' '), w -> w IN ($inList)))")
    val awl10 = (length(col(textCol)) - nWords + 1) * 10 / nWords // avg word len ×10
    val lengthPts = when(nWords >= 50 && nWords <= 2000, 40)
      .when(nWords >= 20, 20).otherwise(0)
    val stopPts = when(stopN * 100 >= nWords * 2, 30) // ≥2% stopwords
      .when(stopN > 0, 15).otherwise(0)
    val wlenPts = when(awl10.between(25, 90), 30).otherwise(10) // 2.5..9.0 chars
    docs.withColumn("quality", lengthPts + stopPts + wlenPts)
  }
}
