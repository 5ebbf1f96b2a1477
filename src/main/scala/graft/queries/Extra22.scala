package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 additions, part 2: data-selection by importance weighting —
  * the DSIR recipe (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"): score every raw document by the
  * log-likelihood ratio of its HASHED n-gram features under a target
  * bag-of-ngrams model vs the raw-corpus model, then admit documents
  * that score better than the corpus average. This is the principled
  * form of the "quality classifier" filter every LLM curation pipeline
  * runs between dedup and tokenization. Scoring/admission machinery
  * lives in [[graft.ops.DsirGate]] (shared with the streaming gate).
  */
object Extra22 {

  val defs: Map[String, Q] = Map(

    // DSIR importance filter. Target distribution = the corpus's English
    // documents; raw = the whole corpus. Features are word unigrams
    // HASHED into 4096 buckets (bucket id = first 3 hex chars of md5 —
    // identical lowercase hex on both engines over the UTF-8 bytes):
    // hashing to a FIXED feature space is the DSIR scale trick — the
    // model is 4096 rows at ANY corpus size, so the scoring join
    // broadcasts forever (unlike text_surprisal's vocab join, which
    // grows with Heaps' law and eventually needs the skew machinery).
    // Both Laplace-smoothed models quantize once per bucket to integer
    // nano-nats (the text_surprisal discipline), so every per-doc
    // weight is an EXACT integer sum. Admission is RELATIVE — wu >
    // thr·n_tok with thr = ⌊Σwu/Σn_tok⌋, the floored corpus-mean
    // per-token weight (ops/DsirGate scaladoc explains why wu > 0 is
    // degenerate under Laplace smoothing on a shared-vocab corpus; the
    // per-token RANKING separates: en ≈ −156.0M units/token vs
    // −158.8…−160.8M for the other langs at sf0.01). The per-source
    // rollup (docs, admitted, admitted weight mass, threshold) is the
    // contamination-style audit view; every gate column is an exact
    // BIGINT. Deliberate asymmetry: the ORACLE derives thr from the
    // per-document side (Σwu/Σn_tok over p) while the Spark plan
    // derives it from the 4096-row MODEL side (Σ_b cr_b·u_b + Nr·kc —
    // the regrouping that saves a second corpus-grain pass, see
    // DsirGate.admissions); the two are the same exact integer, so the
    // hash gate also proves the regrouping identity.
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
        |p AS (SELECT source, doc_id, n_tok,
        |             su + n_tok * (SELECT kc FROM k) AS wu FROM d),
        |h AS (SELECT CAST(FLOOR(CAST(SUM(wu) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE))
        |                  AS BIGINT) AS thr FROM p)
        |SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN wu > thr * n_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
        |       CAST(COALESCE(SUM(CASE WHEN wu > thr * n_tok THEN wu END), 0) AS BIGINT)
        |         AS admitted_units,
        |       thr
        |FROM p, h GROUP BY source, thr ORDER BY source""".stripMargin) { (s, d) =>
      graft.ops.DsirGate.admissions(T.documents(s, d), col("lang") === "en")
        .groupBy("source", "thr")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
          coalesce(sum(when(col("admitted"), col("wu"))), lit(0L)).as("admitted_units"))
        .select(col("source"), col("n_docs"), col("n_admitted"),
          col("admitted_units"), col("thr"))
        .orderBy("source")
    },

    // AVERAGE PRECISION (PR-curve area) — agg_auc's precision-recall
    // sibling, the retrieval/imbalanced-classification metric: per
    // segment, AP = (1/n_pos)·Σ_{positive at rank k} precision@k under
    // the (score DESC) ranking. Exactness despite ranks: ties resolve
    // PESSIMISTICALLY (all tied negatives rank before tied positives —
    // the conservative, order-free convention both engines can replay
    // without a unique row id), so every precision@k term is a ratio of
    // two integers derivable from the COLLAPSED (seg, score) relation:
    // for the j-th positive of a tied group, k = better_cnt + ties_neg
    // + j and cum_pos@k = better_pos + j. Each term quantizes once to
    // integer nano-units (⌊(cum_pos·1e9)/k⌋ — exact: cum_pos·1e9 stays
    // under 2^53 at fixture scale; at 10¹²-row scale divide first), so
    // segment AP sums are EXACT integer sums — ap_units is the gate
    // column, the rounded ratio rides for readability. Scale shape:
    // one (seg, score) rollup, one per-seg window over the COLLAPSED
    // score domain (the agg_auc discipline — never a window over raw
    // rows), per-group inner loop bounded by tie multiplicity, one
    // final rollup.
    "eval_avg_precision" -> Q(
      """WITH e AS (SELECT user_id % 4 AS seg, value AS score,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |g AS (SELECT seg, score, count(*) AS cnt, sum(pos) AS np
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT seg, score, cnt, np,
        |    coalesce(sum(cnt) OVER (PARTITION BY seg ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumcnt,
        |    coalesce(sum(np) OVER (PARTITION BY seg ORDER BY score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumpos
        |  FROM g),
        |t AS (SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n,
        |             CAST(SUM(np) AS BIGINT) AS n_pos
        |      FROM g GROUP BY 1),
        |x AS (SELECT seg,
        |    CAST(FLOOR((cumpos + j) * 1000000000.0
        |               / (cumcnt + (cnt - np) + j)) AS BIGINT) AS unit
        |  FROM (SELECT * FROM r WHERE np > 0) r2,
        |       LATERAL (SELECT unnest(generate_series(1, CAST(r2.np AS BIGINT))) AS j) l),
        |u AS (SELECT seg, CAST(SUM(unit) AS BIGINT) AS ap_units
        |      FROM x GROUP BY 1)
        |SELECT CAST(t.seg AS BIGINT) AS seg, t.n, t.n_pos,
        |  CAST(COALESCE(u.ap_units, 0) AS BIGINT) AS ap_units,
        |  CAST(CASE WHEN t.n_pos > 0 THEN
        |         ROUND(CAST(COALESCE(u.ap_units, 0) AS DOUBLE)
        |               / (t.n_pos * 1000000000.0), 4)
        |       END AS DECIMAL(18,4)) AS ap
        |FROM t LEFT JOIN u USING (seg) ORDER BY seg""".stripMargin) { (s, d) =>
      avgPrecisionOf(T.events(s, d).select((col("user_id") % 4).as("seg"),
        col("value").as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos")))
    }
  )

  /** Exact pessimistic-tie average precision over (seg, score, pos)
    * rows — factored so the spec can pin AP == the brute sequential
    * definition on controlled tie fixtures.
    */
  def avgPrecisionOf(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val g = e.groupBy("seg", "score")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("np"))
    val w = Window.partitionBy("seg").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g
      .withColumn("cumcnt", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("cumpos", coalesce(sum("np").over(w), lit(0L)))
    // sequence(1, np) with np = 0 would generate DESCENDING [1, 0]
    // (the text_bigram_lm trap) — the when-guard is load-bearing.
    val units = r.withColumn("units",
      when(col("np") > 0, expr(
        """aggregate(sequence(1, cast(np as int)), cast(0 as bigint),
          |  (acc, j) -> acc + cast(floor((cumpos + j) * 1000000000.0
          |    / (cumcnt + (cnt - np) + j)) as bigint))""".stripMargin))
        .otherwise(lit(0L)))
    units.groupBy("seg")
      .agg(sum("cnt").as("n"), sum("np").as("n_pos"),
        sum("units").as("ap_units"))
      .select(col("seg").cast("bigint").as("seg"), col("n"), col("n_pos"),
        col("ap_units"),
        // ADVICE r13: a zero-positive segment divides 0.0/0.0 — Spark
        // NULLs the NaN→decimal cast while DuckDB's IEEE NaN can error
        // or diverge under the DECIMAL cast. Guard BOTH engines: AP is
        // undefined with no positives, so emit NULL explicitly.
        when(col("n_pos") > 0,
          round(col("ap_units").cast("double")
            / (col("n_pos") * lit(1000000000.0)), 4))
          .otherwise(lit(null))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("ap"))
      .orderBy("seg")
  }
}
