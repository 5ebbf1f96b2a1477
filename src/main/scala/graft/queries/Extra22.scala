package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Round-13 additions, part 2: data-selection by importance weighting —
  * the DSIR recipe (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"): score every raw document by the
  * log-likelihood ratio of its HASHED n-gram features under a target
  * bag-of-ngrams model vs the raw-corpus model, then admit documents
  * that look more target-like than raw-like. This is the principled form
  * of the "quality classifier" filter every LLM curation pipeline runs
  * between dedup and tokenization.
  */
object Extra22 {

  /** Per-document DSIR importance weight in integer nano-nats:
    * (source, doc_id, wu) where wu = Σ_tokens ⌊(ln(ct_b+1) −
    * ln(cr_b+1))·1e9⌋ + n_tok·⌊(ln(Nr+B) − ln(Nt+B))·1e9⌋ — the
    * quantized log-likelihood ratio of the doc's hashed-unigram bag
    * under the target (`isTarget` rows) vs raw (all rows) Laplace
    * bag-of-ngrams models. Factored out so the spec can pin the
    * separation law (target-exclusive vocab → positive weight,
    * raw-exclusive → negative) on controlled corpora.
    */
  def dsirWeights(docs: org.apache.spark.sql.DataFrame,
      isTarget: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val w = docs
      .select(col("source"), col("doc_id"), isTarget.as("tgt"),
        explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .select(col("source"), col("doc_id"), col("tgt"),
        substring(md5(col("word").cast("binary")), 1, 3).as("bk"))
      .transform(graft.Q.sketchPersist)
    val b = w.groupBy("bk").agg(
      count(lit(1)).as("cr"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    val t = b.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    val u = b.crossJoin(broadcast(t)).select(col("bk"),
      expr("""cast(floor((ln(cast(ct + 1 as double)) - ln(cast(cr + 1 as double)))
             |  * 1000000000) as bigint)""".stripMargin).as("u"))
    val k = t.select(
      expr("""cast(floor((ln(cast(nr + 4096 as double)) - ln(cast(nt + 4096 as double)))
             |  * 1000000000) as bigint)""".stripMargin).as("kc"))
    w.join(broadcast(u), "bk")
      .groupBy("source", "doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("u").as("su"))
      .crossJoin(broadcast(k))
      .select(col("source"), col("doc_id"),
        (col("su") + col("n_tok") * col("kc")).as("wu"))
  }

  val defs: Map[String, Q] = Map(

    // DSIR importance filter. Target distribution = the corpus's English
    // documents (a semantically distinct token distribution the weights
    // can actually separate); raw = the whole corpus. Features are word
    // unigrams HASHED into 4096 buckets (bucket id = first 3 hex chars
    // of md5 — identical lowercase hex on both engines over the UTF-8
    // bytes): hashing to a FIXED feature space is the DSIR scale trick —
    // the model is 4096 rows at ANY corpus size, so the scoring join
    // broadcasts forever (unlike text_surprisal's vocab join, which
    // grows with Heaps' law and eventually needs the skew machinery).
    // Both Laplace-smoothed models quantize once per bucket to integer
    // nano-nats (the text_surprisal discipline): u_b = ⌊(ln(ct_b+1) −
    // ln(cr_b+1))·1e9⌋ plus a per-token constant ⌊(ln(Nr+B) −
    // ln(Nt+B))·1e9⌋ folding the two denominators, so every per-doc
    // weight is an EXACT integer sum — summation order can't move the
    // hash gate. Admission = weight > 0 (the doc scores strictly higher
    // under the target model — DSIR's importance weight e^w > 1); the
    // per-source rollup (docs, admitted, admitted weight mass) is the
    // contamination-style audit view. Scale shape: one explode pass
    // persisted skinny (two consumers: model build + scoring), one
    // 4096-row rollup, one broadcast join back, two keyed rollups —
    // corpus is never key-shuffled at token grain.
    "sample_dsir" -> Q(
      """WITH w AS (
        |  SELECT source, doc_id, lang, substring(md5(word), 1, 3) AS bk
        |  FROM (SELECT source, doc_id, lang,
        |          unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
        |        FROM read_parquet('{sfDir}/documents.parquet'))),
        |b AS (SELECT bk, COUNT(*) AS cr,
        |        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        |      FROM w GROUP BY 1),
        |t AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt FROM b),
        |u AS (SELECT bk,
        |        CAST(FLOOR((ln(CAST(ct + 1 AS DOUBLE)) - ln(CAST(cr + 1 AS DOUBLE)))
        |                   * 1000000000) AS BIGINT) AS u
        |      FROM b),
        |k AS (SELECT CAST(FLOOR((ln(CAST(nr + 4096 AS DOUBLE)) - ln(CAST(nt + 4096 AS DOUBLE)))
        |                        * 1000000000) AS BIGINT) AS kc FROM t),
        |d AS (SELECT source, doc_id, COUNT(*) AS n_tok, SUM(u.u) AS su
        |      FROM w JOIN u USING (bk) GROUP BY 1, 2),
        |p AS (SELECT source, doc_id, su + n_tok * (SELECT kc FROM k) AS wu FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN wu > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
        |       CAST(COALESCE(SUM(CASE WHEN wu > 0 THEN wu END), 0) AS BIGINT) AS admitted_units
        |FROM p GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      dsirWeights(T.documents(s, d), col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("wu") > 0, 1L).otherwise(0L)).as("n_admitted"),
          coalesce(sum(when(col("wu") > 0, col("wu"))), lit(0L)).as("admitted_units"))
        .orderBy("source")
    }
  )
}
