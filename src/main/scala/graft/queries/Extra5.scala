package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-5 batch (SURVEY §2.11e): the training-data-pipeline ops a 100 TB
  * corpus build runs between raw scrape and tokenizer — benchmark
  * decontamination, RAG-style chunking, within-document repetition
  * scoring, context-window sequence packing, corpus heavy hitters — plus
  * the event-analytics staples (funnel, cohort retention, SCD2, linear
  * interpolation, sequence-pattern counts) and two join/graph scale
  * techniques (bucketed band join, oriented triangle counting).
  * Emission contract as everywhere: exact integer/DECIMAL internals, one
  * rounding at the edge, DOUBLE out via SparkEntry.emitDoubles.
  */
object Extra5 {

  /** Word-5-gram shingle relation used by text_decontam: one row per
    * (doc_id, source, distinct gram). Built once; both the benchmark
    * side and the train side derive from it.
    */
  private def gram5(s: org.apache.spark.sql.SparkSession, d: String) =
    T.documents(s, d)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), explode(expr(
        """array_distinct(transform(
          |  sequence(1, greatest(size(w) - 4, 0)),
          |  i -> concat_ws(' ', element_at(w, i), element_at(w, i+1),
          |                 element_at(w, i+2), element_at(w, i+3),
          |                 element_at(w, i+4))))""".stripMargin)).as("gram"))

  val defs: Map[String, Q] = Map(

    // Benchmark decontamination — the step every training run performs
    // before tokenizing: drop (here: count) training documents sharing
    // any word-5-gram with the held-out benchmark set. Scale shape: the
    // benchmark shingle set is small by construction (benchmarks are
    // thousands of docs, not billions) → distinct + broadcast, then a
    // LEFT SEMI join prunes the exploded train shingles without
    // shuffling them; the per-doc distinct and the per-source rollup are
    // ordinary two-phase aggs. Nothing all-pairs anywhere.
    "text_decontam" -> Q(
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(string_split(text,' ')) - 4, 0)),
        |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |      || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3]
        |      || ' ' || string_split(text,' ')[i+4]))) AS gram
        |  FROM read_parquet('{sfDir}/documents.parquet')),
        |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        |hit AS (SELECT DISTINCT g.doc_id FROM g JOIN b USING (gram)
        |        WHERE g.doc_id % 97 <> 0),
        |d AS (SELECT doc_id, source FROM read_parquet('{sfDir}/documents.parquet')
        |      WHERE doc_id % 97 <> 0)
        |SELECT d.source, COUNT(*) AS n_train,
        |       COUNT(hit.doc_id) AS n_contam
        |FROM d LEFT JOIN hit ON d.doc_id = hit.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, d) =>
      val g = gram5(s, d)
      val bench = g.filter(col("doc_id") % 97 === 0).select("gram").distinct()
      val contaminated = g.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("gram"), "left_semi")
        .select("doc_id").distinct()
        .withColumn("hit", lit(1))
      T.documents(s, d).filter(col("doc_id") % 97 =!= 0)
        .select("doc_id", "source")
        .join(contaminated, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_train"), count(col("hit")).as("n_contam"))
        .orderBy("source")
    },

    // RAG/context chunking — split every document into fixed-size
    // overlapping character chunks (size 200, stride 150) and roll the
    // chunk inventory up per source. The chunk starts are derived
    // arithmetically from n_chars (no UDF, no per-row loop): explode a
    // sequence() of offsets, substring() each — pure codegen'd
    // expressions, embarrassingly parallel, zero shuffles before the
    // final rollup.
    "text_chunk" -> Q(
      """WITH c AS (
        |  SELECT source,
        |         substr(text, k * 150 + 1, 200) AS chunk
        |  FROM read_parquet('{sfDir}/documents.parquet')
        |  CROSS JOIN (SELECT unnest(generate_series(0, 10000)) AS k) ks
        |  WHERE k * 150 < n_chars)
        |SELECT source, COUNT(*) AS n_chunks,
        |       CAST(SUM(length(chunk)) AS BIGINT) AS sum_chunk_chars,
        |       CAST(SUM(CASE WHEN chunk LIKE '%data%' THEN 1 ELSE 0 END) AS BIGINT) AS n_with_data
        |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .select(col("source"), col("text"),
          explode(expr("sequence(0, int(greatest(n_chars - 1, 0) div 150))")).as("k"))
        .select(col("source"),
          expr("substring(text, k * 150 + 1, 200)").as("chunk"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          sum(length(col("chunk"))).as("sum_chunk_chars"),
          sum(when(col("chunk").contains("data"), 1).otherwise(0)).as("n_with_data"))
        .orderBy("source")
    },

    // Within-document repetition scoring — the quality signal that
    // catches boilerplate/spam: fraction of word-3-grams that are
    // repeats of an earlier 3-gram in the same document. Computed
    // entirely inside per-row array expressions (size vs
    // size∘array_distinct) — no explode, no shuffle until the per-lang
    // rollup; at 100 TB this is a map-only pass plus a 5-group agg.
    "text_repetition" -> Q(
      """WITH r AS (
        |  SELECT lang,
        |    greatest(len(string_split(text,' ')) - 2, 0) AS n_g,
        |    len(list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |        || ' ' || string_split(text,' ')[i+2]))) AS n_d
        |  FROM read_parquet('{sfDir}/documents.parquet'))
        |SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_g) AS BIGINT) AS sum_grams,
        |       CAST(SUM(n_d) AS BIGINT) AS sum_distinct,
        |       CAST(SUM(CASE WHEN n_d < n_g THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .select(col("lang"), split(col("text"), " ").as("w"))
        .select(col("lang"),
          expr("greatest(size(w) - 2, 0)").as("n_g"),
          expr(
            """size(array_distinct(transform(
              |  sequence(1, greatest(size(w) - 2, 0)),
              |  i -> concat_ws(' ', element_at(w, i), element_at(w, i+1),
              |                 element_at(w, i+2)))))""".stripMargin).as("n_d"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_g").as("sum_grams"), sum("n_d").as("sum_distinct"),
          sum(when(col("n_d") < col("n_g"), 1).otherwise(0)).as("n_repetitive"))
        .orderBy("lang")
    },

    // Context-window sequence packing — assign documents (in stable
    // doc_id order) to consecutive 2048-token bins, the packing step
    // that turns a deduped corpus into fixed-length training sequences.
    // Packing is per SOURCE shard: the running sum windows over
    // (source) partitions, so parallelism scales with shard count and
    // no global single-partition window exists — exactly how a corpus
    // is packed in practice (per input shard, never globally).
    "pack_sequences" -> Q(
      """WITH t AS (
        |  SELECT source, doc_id,
        |         len(string_split(text,' ')) AS tok
        |  FROM read_parquet('{sfDir}/documents.parquet')),
        |c AS (
        |  SELECT source, doc_id, tok,
        |         SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - tok) // 2048 AS BIGINT) AS bin,
        |       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.documents(s, d)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .withColumn("cum", sum("tok").over(w))
        .select(col("source"), expr("(cum - tok) div 2048").as("bin"), col("tok"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("sum_tokens"))
        .orderBy("source", "bin")
    },

    // Corpus heavy hitters — exact frequent-items over the token stream:
    // every word whose count exceeds 1% of all tokens. The threshold is
    // a broadcast scalar (one tiny agg), the counts are the usual
    // partial+final pair — at 100 TB the shuffle carries one row per
    // DISTINCT word, not per token. (The sketch-based siblings for
    // cardinality live in agg_approx_distinct; here exactness is the
    // point — heavy hitters feed tokenizer vocab decisions.)
    "agg_heavy_hitters" -> Q(
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
        |           FROM read_parquet('{sfDir}/documents.parquet')),
        |t AS (SELECT COUNT(*) AS n FROM w)
        |SELECT word, COUNT(*) AS cnt
        |FROM w GROUP BY word
        |HAVING COUNT(*) * 100 > (SELECT n FROM t)
        |ORDER BY cnt DESC, word""".stripMargin) { (s, d) =>
      val counts = T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum("cnt").as("n"))
      counts.join(broadcast(total))
        .filter(col("cnt") * 100 > col("n"))
        .select("word", "cnt")
        .orderBy(col("cnt").desc, col("word"))
    }
  )
}
