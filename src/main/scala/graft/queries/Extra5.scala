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
        |  CROSS JOIN (SELECT unnest(generate_series(0,
        |    (SELECT COALESCE(CAST(MAX(n_chars) AS BIGINT), 0) // 150
        |     FROM read_parquet('{sfDir}/documents.parquet')))) AS k) ks
        |  WHERE k * 150 < n_chars)
        |SELECT source, COUNT(*) AS n_chunks,
        |       CAST(SUM(length(chunk)) AS BIGINT) AS sum_chunk_chars,
        |       CAST(SUM(CASE WHEN chunk LIKE '%data%' THEN 1 ELSE 0 END) AS BIGINT) AS n_with_data
        |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      // The oracle's offset series is DATA-DERIVED (max n_chars // 150 —
      // no hard cap to outgrow); the Spark filter mirrors its WHERE
      // exactly so a zero-length document emits no chunk on either
      // engine (sequence(0, 0) would otherwise emit one empty k=0 chunk
      // that the oracle excludes).
      T.documents(s, d)
        .select(col("source"), col("text"), col("n_chars"),
          explode(expr("sequence(0, int(greatest(n_chars - 1, 0) div 150))")).as("k"))
        .filter(expr("k * 150 < n_chars"))
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
    },

    // Conversion funnel — users reaching view → click-after-view →
    // purchase-after-click, each stage gated on STRICTLY-after event
    // time. Stage timestamps stay in the raw int64 nanosecond domain on
    // both engines (never truncated — a µs cast could merge distinct
    // events). Scale shape: three per-user aggs + two joins all keyed on
    // user_id — one co-partitioned shuffle family, no windows, no
    // self-cross.
    "funnel_conversion" -> Q(
      """WITH v AS (SELECT user_id, MIN(ts) AS t1
        |           FROM read_parquet('{sfDir}/events.parquet')
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2
        |      FROM read_parquet('{sfDir}/events.parquet') e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3
        |      FROM read_parquet('{sfDir}/events.parquet') e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |       (SELECT COUNT(*) FROM c) AS n_click,
        |       (SELECT COUNT(*) FROM p) AS n_purchase""".stripMargin) { (s, d) =>
      val e = T.events(s, d).select("user_id", "event_type", "ts")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    },

    // Cohort retention — users grouped by first-activity week, counted
    // per week offset they return in. The classic growth-analytics
    // matrix. All keying is integer week numbers (epoch // 604800);
    // one per-user agg + one co-partitioned join + one distinct agg on
    // a (cohort, offset) key space that is tiny regardless of data
    // volume.
    "retention_cohort" -> Q(
      """WITH f AS (SELECT user_id, MIN(ts) AS ft
        |           FROM read_parquet('{sfDir}/events.parquet') GROUP BY user_id),
        |w AS (SELECT e.user_id,
        |        CAST(FLOOR(epoch(f.ft)) AS BIGINT) // 604800 AS cw,
        |        CAST(FLOOR(epoch(e.ts)) AS BIGINT) // 604800 AS ew
        |      FROM read_parquet('{sfDir}/events.parquet') e
        |      JOIN f ON e.user_id = f.user_id)
        |SELECT cw * 604800 AS cohort_s, ew - cw AS week_offset,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM w GROUP BY cohort_s, week_offset
        |ORDER BY cohort_s, week_offset""".stripMargin) { (s, d) =>
      val e = T.events(s, d)
        .select(col("user_id"), expr("(ts div 1000000000) div 604800").as("ew"))
      val f = e.groupBy("user_id").agg(min("ew").as("cw"))
      e.join(f, "user_id")
        .groupBy((col("cw") * 604800).as("cohort_s"),
          (col("ew") - col("cw")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_s", "week_offset")
    },

    // SCD type-2 interval build — turn a change log (orders per
    // customer, ordered by date with an orderkey tiebreak for total
    // order) into validity intervals: valid_from = change day,
    // valid_to = next change day, open interval = current row. One
    // window per customer partition, integer day arithmetic
    // throughout, rolled up by status so output stays bounded at any
    // SF.
    "scd2_build" -> Q(
      """WITH ch AS (
        |  SELECT o_custkey, o_orderstatus,
        |    CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS from_day,
        |    LEAD(CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400)
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS to_day
        |  FROM read_parquet('{sfDir}/orders.parquet'))
        |SELECT o_orderstatus, COUNT(*) AS n_intervals,
        |  CAST(SUM(CASE WHEN to_day IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
        |  CAST(SUM(CASE WHEN to_day IS NOT NULL THEN to_day - from_day ELSE 0 END) AS BIGINT) AS sum_days
        |FROM ch GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      T.orders(s, d)
        .select(col("o_custkey"), col("o_orderstatus"), col("o_orderkey"),
          col("o_orderdate"),
          expr("unix_timestamp(o_orderdate) div 86400").as("from_day"))
        .withColumn("to_day", lead("from_day", 1).over(w))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_intervals"),
          sum(when(col("to_day").isNull, 1).otherwise(0)).as("n_current"),
          sum(when(col("to_day").isNotNull, col("to_day") - col("from_day"))
            .otherwise(0)).as("sum_days"))
        .orderBy("o_orderstatus")
    },

    // Linear-interpolation gap fill — the sibling of ts_resample's LOCF:
    // per-user hourly series between first and last observation, missing
    // hours filled by exact linear interpolation between the bracketing
    // observations. Determinism: per-hour means divide an exact
    // DECIMAL-summed numerator (as double) by an integer count — IEEE
    // division both engines perform identically; the interpolation is
    // pure +,-,*,/ on those doubles (bit-identical), then quantized to
    // integer micro-units with floor(v·10⁶) — one IEEE multiply + floor,
    // bit-identical everywhere (ROUND on a double is NOT: DuckDB rounds
    // via float math, Spark via exact decimal HALF_UP — they disagree on
    // near-tie values) — before the order-independent integer sum.
    // Scale shape: one keyed agg, one sequence explode, two frame-bounded
    // windows over (user) partitions — no global window anywhere.
    "ts_interp" -> Q(
      """WITH obs AS (
        |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS h,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
        |  FROM read_parquet('{sfDir}/events.parquet') GROUP BY user_id, h),
        |b AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY user_id),
        |s AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM b),
        |j AS (SELECT s.user_id, s.h, obs.v
        |      FROM s LEFT JOIN obs ON s.user_id = obs.user_id AND s.h = obs.h),
        |x AS (SELECT user_id, h, v,
        |   LAST_VALUE(v IGNORE NULLS) OVER
        |     (PARTITION BY user_id ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |   LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
        |     (PARTITION BY user_id ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |   FIRST_VALUE(v IGNORE NULLS) OVER
        |     (PARTITION BY user_id ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |   FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
        |     (PARTITION BY user_id ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        | FROM j)
        |SELECT user_id, COUNT(*) AS n_hours, COUNT(v) AS n_obs,
        |  CAST(SUM(CAST(FLOOR((CASE WHEN v IS NOT NULL THEN v
        |    ELSE pv + (nv - pv) * (CAST(h - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
        |    END) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_interp_u
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val obs = T.events(s, d)
        .select(col("user_id"), expr("(ts div 1000000000) div 3600").as("h"),
          dec2(col("value")).as("v2"))
        .groupBy("user_id", "h")
        .agg((sum("v2").cast("double") / count(lit(1))).as("v"))
      val series = obs.groupBy("user_id")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("h"))
      val wp = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      series.join(obs, Seq("user_id", "h"), "left")
        .withColumn("pv", last("v", ignoreNulls = true).over(wp))
        .withColumn("ph",
          last(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wp))
        .withColumn("nv", first("v", ignoreNulls = true).over(wn))
        .withColumn("nh",
          first(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wn))
        .withColumn("iv",
          when(col("v").isNotNull, col("v"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("h") - col("ph")).cast("double") /
                (col("nh") - col("ph")).cast("double"))))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_hours"), count(col("v")).as("n_obs"),
          sum(floor(col("iv") * lit(1000000.0)).cast("long")).as("sum_interp_u"))
        .orderBy("user_id")
    },

    // Sequence-pattern counting (MATCH_RECOGNIZE-flavored): per user,
    // order the event-initial string by (ts, event_id) — a total order —
    // and count non-overlapping view→click*→purchase runs with one
    // regexp scan. The per-user sequence is built with
    // array_sort∘collect_list over unique sort keys (collect order is
    // nondeterministic; the sort makes it total), never assumed from
    // shuffle order. State per user is one string — the batch twin of a
    // flatMapGroupsWithState session machine, and that machine IS the
    // scale path: the collect_list concentrates a user's whole history
    // into one row in one task, so admission is guarded at 1M
    // events/user (≈ a few MB of struct rows — comfortably one task;
    // fixtures max out at ~100). An unboundedly hot user belongs on the
    // streaming form, which carries O(1) state per user — parity with
    // this query is proven in StreamBatchParitySpec ("stateful vc*p
    // counter"). NOTE the guard is an EAGER aggregation at
    // plan-construction time (merely building this query runs one
    // counts-only Spark job — PlanSpec's all-queries loop and the
    // PLANS.md dump pay it too); acceptable while plan builds are rare,
    // and a deployment that constructs plans en masse would defer the
    // check to first materialization.
    "seq_pattern" -> Q(
      """WITH s AS (
        |  SELECT user_id,
        |         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq,
        |         COUNT(*) AS n_events
        |  FROM read_parquet('{sfDir}/events.parquet') GROUP BY user_id)
        |SELECT user_id, n_events,
        |       CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels
        |FROM s ORDER BY user_id""".stripMargin) { (s, d) =>
      Q.requireMaxGroupSize(
        T.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c")),
        key = "user_id", maxRows = 1000000L, ctx = "seq_pattern",
        scalePath = "the flatMapGroupsWithState vc*p state machine " +
          "(StreamBatchParitySpec)")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("c"))))
            .as("arr"))
        .select(col("user_id"), col("n_events"),
          expr("cast(regexp_count(array_join(transform(arr, x -> x.c), ''), 'vc*p') as bigint)")
            .as("n_funnels"))
        .orderBy("user_id")
    },

    // Triangle counting on an oriented edge list — the graph-analytics
    // capstone over the components machinery (dedup_cluster): edges are
    // synthesized deterministically from orders, deduped in canonical
    // a<b form, then ORIENTED BY DEGREE — each undirected edge points
    // from its lower-(degree, id) endpoint to the higher — and each
    // triangle is counted exactly once via the two-path + closing-edge
    // join (s→t is a total order, so exactly one rotation of every
    // triangle matches). Degree orientation is THE scale trick: a
    // vertex's out-neighbors all have degree ≥ its own, which caps
    // out-degree at O(√m) and gives the standard O(m^1.5) enumeration
    // bound. Orienting by id alone does NOT — a low-id hub keeps all
    // its neighbors as out-edges and the two-path join fans out
    // quadratically on a skewed graph. The triangle count is
    // orientation-invariant, so the oracle keeps its simpler id
    // orientation — any divergence is a Spark-side orientation bug.
    "graph_triangles" -> Q(
      """WITH e AS (
        |  SELECT DISTINCT
        |    LEAST(o_custkey % 60, (o_custkey + o_orderkey) % 60) AS a,
        |    GREATEST(o_custkey % 60, (o_custkey + o_orderkey) % 60) AS b
        |  FROM read_parquet('{sfDir}/orders.parquet')
        |  WHERE o_custkey % 60 <> (o_custkey + o_orderkey) % 60),
        |t AS (SELECT COUNT(*) AS n_tri
        |      FROM e e1 JOIN e e2 ON e2.a = e1.b
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |v AS (SELECT COUNT(DISTINCT x) AS n_vertices
        |      FROM (SELECT a AS x FROM e UNION SELECT b FROM e))
        |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
        |       (SELECT n_vertices FROM v) AS n_vertices,
        |       (SELECT n_tri FROM t) AS n_triangles""".stripMargin) { (s, d) =>
      val raw = T.orders(s, d).select(
        (col("o_custkey") % 60).as("x"),
        ((col("o_custkey") + col("o_orderkey")) % 60).as("y"))
        .filter(col("x") =!= col("y"))
      val eu = raw.select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b")).distinct()
      // Melt each undirected edge into its two (endpoint, other) halves
      // so the degree attach is ONE equi-join against the (v → dg)
      // degree map instead of two endpoint joins (round 6 shipped two
      // joins plus a persist of eu — pure fixed overhead on a small
      // graph: within one plan Catalyst's ReusedExchange already shares
      // the distinct shuffle between the melt's consumers, and only the
      // oriented list e has multiple differently-keyed consumers worth a
      // persist). The degree map is |V|-sized — AQE broadcasts it when
      // small; at scale the attach stays a co-partitioned hash join on
      // v, never a driver collect.
      val melted = eu.select(explode(array(
          struct(col("a").as("v"), col("b").as("o")),
          struct(col("b").as("v"), col("a").as("o")))).as("h"))
        .select(col("h.v").as("v"), col("h.o").as("o"))
      val deg = melted.groupBy("v").agg(count(lit(1)).as("dg"))
      // Orient low-(degree, id) → high: per edge keep the endpoint with
      // the minimum (dg, v) as the source — min over the (dg, v, o)
      // struct is a total order (degree ties fall back to the id, and
      // a < b already holds), so the pick is deterministic and degree
      // orientation caps out-degree at O(√m). The oriented list e feeds
      // all three triangle-join sides (differing join keys defeat
      // exchange reuse), so e is the one relation worth persisting —
      // CacheScope releases it.
      val e = melted.join(deg, "v")
        .groupBy(least(col("v"), col("o")).as("a"),
          greatest(col("v"), col("o")).as("b"))
        .agg(min(struct(col("dg"), col("v"), col("o"))).as("m"))
        .select(col("m.v").as("s"), col("m.o").as("t"))
        .transform(graft.Q.sketchPersist)
      val e1 = e.select(col("s").as("s1"), col("t").as("t1"))
      val e2 = e.select(col("s").as("s2"), col("t").as("t2"))
      val e3 = e.select(col("s").as("s3"), col("t").as("t3"))
      val tri = e1.join(e2, col("t1") === col("s2"))
        .join(e3, col("s3") === col("s1") && col("t3") === col("t2"))
        .agg(count(lit(1)).as("n_triangles"))
      // Summary stats from the PERSISTED oriented list (one agg over
      // cached skinny rows), not from deg — the degree branch would
      // recompute the orders scan + distinct for a count the edge list
      // already carries. Orientation is a bijection on undirected edges,
      // so |e| = n_edges and its endpoint set is the vertex set.
      val stats = e.select(explode(array(col("s"), col("t"))).as("v"))
        .agg(expr("cast(count(1) div 2 as bigint)").as("n_edges"),
          countDistinct(col("v")).as("n_vertices"))
      stats.crossJoin(tri)
    },

    // Band join — |s_acctbal − c_acctbal| ≤ 1.0 WITHOUT a nested-loop
    // plan: bucket both sides by floor(value/ε), explode the small side
    // to its ±1 neighbor buckets, equi-join on the bucket, exact-filter
    // the band. |x−y| ≤ ε ⟹ bucket(x) − bucket(y) ∈ {−1,0,1}, so the
    // bucket join is a superset of the band and the residual filter is
    // exact. The oracle is the plain theta join — the bucketing must be
    // result-invisible. At 100 TB this turns an O(n·m) comparison into
    // a hash join with 3× replication of the SMALL side only.
    "join_band" -> Q(
      """SELECT COUNT(*) AS n_pairs,
        |       CAST(SUM(s_suppkey) AS BIGINT) AS sum_skey,
        |       CAST(SUM(c_custkey) AS BIGINT) AS sum_ckey
        |FROM read_parquet('{sfDir}/supplier.parquet') s
        |JOIN read_parquet('{sfDir}/customer.parquet') c
        |  ON abs(s.s_acctbal - c.c_acctbal) <= 1.0""".stripMargin) { (s, d) =>
      val sup = T.supplier(s, d)
        .select(col("s_suppkey"), col("s_acctbal"), floor(col("s_acctbal")).as("k0"))
        .select(col("s_suppkey"), col("s_acctbal"),
          explode(expr("array(k0 - 1L, k0, k0 + 1L)")).as("bk"))
      val cust = T.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"), floor(col("c_acctbal")).as("bk"))
      cust.join(sup, "bk")
        .filter(abs(col("s_acctbal") - col("c_acctbal")) <= 1.0)
        .agg(count(lit(1)).as("n_pairs"),
          sum("s_suppkey").as("sum_skey"), sum("c_custkey").as("sum_ckey"))
    },

    // Geo distance — haversine from a synthesized per-customer
    // (lat, lon) grid point to a fixed reference, emitted as integer
    // METERS via floor(km·1000): the trig runs on identical doubles in
    // both engines (grid coordinates are exact .5-offset values; libm
    // parity verified at 16.5k rows) and the single multiply+floor is
    // bit-deterministic — ROUND on a double is not (the ts_interp
    // lesson). The inner term is clamped to [0,1] before asin against
    // fp drift at the antipode.
    "fn_geo" -> Q(
      """SELECT c_custkey,
        |  CAST(FLOOR(2 * 6371.0 * asin(sqrt(least(
        |    pow(sin(radians(((c_custkey % 180) - 89.5) - 40.0) / 2), 2)
        |    + cos(radians((c_custkey % 180) - 89.5)) * cos(radians(40.0))
        |      * pow(sin(radians((((c_custkey * 7) % 360) - 179.5) - (-74.0)) / 2), 2),
        |    1.0))) * 1000.0) AS BIGINT) AS dist_m
        |FROM read_parquet('{sfDir}/customer.parquet')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      T.customer(s, d).select(col("c_custkey"),
        expr(
          """cast(floor((2 * 6371.0D * asin(sqrt(least(
            |  pow(sin(radians(((c_custkey % 180) - 89.5D) - 40.0D) / 2), 2)
            |  + cos(radians((c_custkey % 180) - 89.5D)) * cos(radians(40.0D))
            |    * pow(sin(radians((((c_custkey * 7) % 360) - 179.5D) - (-74.0D)) / 2), 2),
            |  1.0D)))) * 1000.0D) as bigint)""".stripMargin).as("dist_m"))
        .orderBy("c_custkey")
    },

    // Truncated EWMA in exact integer arithmetic — the smoothing
    // window analytics stacks on monitoring series. Weights are powers
    // of two over the last 8 observations (half-life 1 step), so with
    // values in exact cents the weighted numerator and denominator are
    // plain BIGINTs and the single floor division at the edge is
    // bit-identical in both engines — no float accumulation anywhere.
    // The 8 lags share one window sort; per-partition windows keyed by
    // user, never global.
    "win_ewma" -> Q(
      """WITH v AS (
        |  SELECT user_id, event_id,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |         ts
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |l AS (
        |  SELECT user_id, event_id, c,
        |    LAG(c, 1) OVER w AS c1, LAG(c, 2) OVER w AS c2,
        |    LAG(c, 3) OVER w AS c3, LAG(c, 4) OVER w AS c4,
        |    LAG(c, 5) OVER w AS c5, LAG(c, 6) OVER w AS c6,
        |    LAG(c, 7) OVER w AS c7
        |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id,
        |  CAST((c * 128 + COALESCE(c1, 0) * 64 + COALESCE(c2, 0) * 32
        |      + COALESCE(c3, 0) * 16 + COALESCE(c4, 0) * 8 + COALESCE(c5, 0) * 4
        |      + COALESCE(c6, 0) * 2 + COALESCE(c7, 0))
        |    // (128 + CASE WHEN c1 IS NULL THEN 0 ELSE 64 END
        |       + CASE WHEN c2 IS NULL THEN 0 ELSE 32 END
        |       + CASE WHEN c3 IS NULL THEN 0 ELSE 16 END
        |       + CASE WHEN c4 IS NULL THEN 0 ELSE 8 END
        |       + CASE WHEN c5 IS NULL THEN 0 ELSE 4 END
        |       + CASE WHEN c6 IS NULL THEN 0 ELSE 2 END
        |       + CASE WHEN c7 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS ewma_c
        |FROM l ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val v = T.events(s, d).select(col("user_id"), col("event_id"), col("ts"),
        (dec2(col("value")) * 100).cast("long").as("c"))
      val withLags = (1 to 7).foldLeft(v) { (df, i) =>
        df.withColumn(s"c$i", lag("c", i).over(w))
      }
      val num = (1 to 7).map(i => s"COALESCE(c$i, 0L) * ${1 << (7 - i)}")
        .mkString("c * 128 + ", " + ", "")
      val den = (1 to 7).map(i =>
        s"CASE WHEN c$i IS NULL THEN 0 ELSE ${1 << (7 - i)} END")
        .mkString("128 + ", " + ", "")
      withLags
        .select(col("user_id"), col("event_id"),
          expr(s"CAST(($num) div ($den) AS BIGINT)").as("ewma_c"))
        .orderBy("user_id", "event_id")
    },

    // Z-score anomaly detection — flag events more than 2σ from their
    // user's mean. Determinism (the agg_stddev recipe): Σv and Σv² are
    // summed as exact DECIMALs (v is DECIMAL(18,2), v² is DECIMAL(36,4)
    // — inside precision 38), converted to double once; mean, variance,
    // sqrt and the 2σ comparison are then the identical IEEE expression
    // tree in both engines. Scale shape: one keyed agg + one
    // co-partitioned join back to the events (both shuffles on
    // user_id), then a second keyed agg — no window, no broadcast of
    // anything data-sized.
    "ts_outlier" -> Q(
      """WITH m AS (
        |  SELECT user_id, COUNT(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS svv
        |  FROM read_parquet('{sfDir}/events.parquet') GROUP BY user_id)
        |SELECT e.user_id, MAX(m.n) AS n_events,
        |  CAST(SUM(CASE WHEN abs(CAST(e.value AS DOUBLE) - m.sv / m.n)
        |                     > 2 * sqrt(greatest(m.svv / m.n - (m.sv / m.n) * (m.sv / m.n), 0))
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM read_parquet('{sfDir}/events.parquet') e
        |JOIN m ON e.user_id = m.user_id
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin) { (s, d) =>
      val ev = T.events(s, d).select(col("user_id"), col("value"))
      val m = ev.groupBy("user_id").agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sv"),
        sum(dec2(col("value")) * dec2(col("value"))).cast("double").as("svv"))
      ev.join(m, "user_id")
        .groupBy("user_id")
        .agg(max(col("n")).as("n_events"),
          sum(when(
            abs(col("value").cast("double") - col("sv") / col("n")) >
              lit(2) * sqrt(greatest(
                col("svv") / col("n") - (col("sv") / col("n")) * (col("sv") / col("n")),
                lit(0))), 1).otherwise(0)).as("n_outliers"))
        .orderBy("user_id")
    },

    // PageRank, 3 power iterations — completes the graph family
    // (components → dedup_cluster, triangles → graph_triangles). The
    // loop lives in ops.PageRank (parameterized iterations, per-round
    // localCheckpoint lineage truncation — the Components recipe, so
    // iteration counts >3 don't blow up the analyzer; PageRankSpec runs
    // 12 rounds). All arithmetic is INTEGER: ranks live in 1e-12 units
    // as BIGINT, each out-contribution is rank DIV outdeg and the
    // damping step is (85·Σ) DIV 100 — floor division is bit-identical
    // in both engines, so the iteration needs no decimal/double
    // division contract at all (decimal÷decimal scale rules DIVERGE
    // between engines; integer truncation cannot). Dangling vertices
    // contribute nothing (simplified variant, identical on both sides).
    "graph_pagerank" -> Q(
      """WITH e AS (
        |  SELECT DISTINCT o_custkey % 97 AS src, (o_orderkey * 31) % 97 AS dst
        |  FROM read_parquet('{sfDir}/orders.parquet')
        |  WHERE (o_custkey % 97 + (o_orderkey * 31) % 97) % 7 < 2
        |    AND o_custkey % 97 <> (o_orderkey * 31) % 97),
        |v AS (SELECT DISTINCT x AS vid FROM (SELECT src AS x FROM e UNION SELECT dst FROM e)),
        |n AS (SELECT COUNT(*) AS nv FROM v),
        |deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
        |r0 AS (SELECT vid, 1000000000000 // (SELECT nv FROM n) AS r FROM v),
        |r1 AS (SELECT v.vid,
        |         150000000000 // (SELECT nv FROM n)
        |         + 85 * COALESCE(SUM(r0.r // deg.od), 0) // 100 AS r
        |       FROM v LEFT JOIN e ON e.dst = v.vid
        |       LEFT JOIN deg ON deg.src = e.src
        |       LEFT JOIN r0 ON r0.vid = e.src
        |       GROUP BY v.vid),
        |r2 AS (SELECT v.vid,
        |         150000000000 // (SELECT nv FROM n)
        |         + 85 * COALESCE(SUM(r1.r // deg.od), 0) // 100 AS r
        |       FROM v LEFT JOIN e ON e.dst = v.vid
        |       LEFT JOIN deg ON deg.src = e.src
        |       LEFT JOIN r1 ON r1.vid = e.src
        |       GROUP BY v.vid),
        |r3 AS (SELECT v.vid,
        |         150000000000 // (SELECT nv FROM n)
        |         + 85 * COALESCE(SUM(r2.r // deg.od), 0) // 100 AS r
        |       FROM v LEFT JOIN e ON e.dst = v.vid
        |       LEFT JOIN deg ON deg.src = e.src
        |       LEFT JOIN r2 ON r2.vid = e.src
        |       GROUP BY v.vid)
        |SELECT vid, CAST(r AS BIGINT) AS rank_u FROM r3
        |ORDER BY vid""".stripMargin) { (s, d) =>
      val e = T.orders(s, d)
        .select((col("o_custkey") % 97).as("src"),
          ((col("o_orderkey") * 31) % 97).as("dst"))
        .filter((col("src") + col("dst")) % 7 < 2 && col("src") =!= col("dst"))
        .distinct()
      graft.ops.PageRank.run(e, iterations = 3)
        .select(col("vid"), col("r").as("rank_u")).orderBy("vid")
    },

    // Count-min frequency sketch (graft.functions.CountMinAgg, the
    // second typed-Aggregator ladder rung after agg_weighted): the whole
    // token stream folds into ONE 8 KB counter array via map-side
    // partial merges; the broadcast sketch then answers per-word
    // frequency estimates as 4 codegen'd array lookups. Gate (the
    // agg_approx_distinct pattern): per word, the estimate must be ≥ the
    // exact count (CM never under-counts — structural) and within
    // N/50 above it (generous vs the measured zero/near-zero collision
    // overcount; oracle emits the exact counts and TRUE).
    "agg_countmin" -> Q(
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
        |           FROM read_parquet('{sfDir}/documents.parquet'))
        |SELECT word, COUNT(*) AS cnt, TRUE AS within_bound
        |FROM w GROUP BY word ORDER BY word""".stripMargin) { (s, d) =>
      s.udf.register("count_min", udaf(graft.functions.CountMinAgg))
      val words = T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
      val sketch = words.agg(expr("count_min(xxhash64(word))").as("buf"))
      val counts = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum("cnt").as("n"))
      counts.join(broadcast(sketch)).join(broadcast(total))
        .select(col("word"), col("cnt"),
          expr(graft.functions.CountMinAgg.estimateSql("buf", "word")).as("est"),
          col("n"))
        .select(col("word"), col("cnt"),
          (col("est") >= col("cnt") &&
            col("est") <= col("cnt") + greatest(expr("n div 50"), lit(1L)))
            .as("within_bound"))
        .orderBy("word")
    },

    // Sub-document (paragraph-level) dedup — the CCNet/RefinedWeb step
    // that whole-doc dedup misses: chop every document into fixed
    // 12-word blocks, keep each distinct block's first occurrence
    // ((doc_id, block_idx) minimum — a total order), count survivors
    // per source. One window over blocks partitioned BY BLOCK TEXT (at
    // 100 TB: by the block's hash — uniform keys, no skew), which is
    // the only shuffle; block construction is pure per-row array
    // slicing.
    "dedup_paragraph" -> Q(
      """WITH b AS (
        |  SELECT doc_id, source, k AS bidx,
        |         array_to_string(list_slice(string_split(text, ' '),
        |                                    k * 12 + 1, k * 12 + 12), ' ') AS btext
        |  FROM read_parquet('{sfDir}/documents.parquet')
        |  CROSS JOIN (SELECT unnest(generate_series(0,
        |    (SELECT COALESCE(MAX(len(string_split(text, ' '))), 0) // 12
        |     FROM read_parquet('{sfDir}/documents.parquet')))) AS k) ks
        |  WHERE k * 12 < len(string_split(text, ' '))),
        |r AS (SELECT source, btext,
        |        ROW_NUMBER() OVER (PARTITION BY btext ORDER BY doc_id, bidx) AS rn
        |      FROM b)
        |SELECT source, COUNT(*) AS n_blocks,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN rn = 1 THEN length(btext) ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("btext").orderBy("doc_id", "bidx")
      T.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("source"),
          explode(expr("sequence(0, int((size(w) - 1) div 12))")).as("bidx"),
          col("w"))
        .select(col("doc_id"), col("source"), col("bidx"),
          expr("concat_ws(' ', slice(w, bidx * 12 + 1, 12))").as("btext"))
        .withColumn("rn", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_blocks"),
          sum(when(col("rn") === 1, 1).otherwise(0)).as("n_kept"),
          sum(when(col("rn") === 1, length(col("btext"))).otherwise(0)).as("kept_chars"))
        .orderBy("source")
    },

    // The SQL-text surface — the engine's queries are equally runnable as
    // ANSI SQL through spark.sql() over registered views (TPC-H Q3
    // shape: segment filter → 3-way join → revenue top-10). Catalyst
    // compiles this to the identical physical plan the DataFrame form
    // would get (broadcast dim, two-phase agg, TakeOrderedAndProject) —
    // declared to pin that the text path stays first-class.
    "sql_q3" -> Q(
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue,
        |  CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS o_day
        |FROM read_parquet('{sfDir}/customer.parquet') c
        |JOIN read_parquet('{sfDir}/orders.parquet') o ON c.c_custkey = o.o_custkey
        |JOIN read_parquet('{sfDir}/lineitem.parquet') l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_day
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      T.customer(s, d).createOrReplaceTempView("graft_customer")
      T.orders(s, d).createOrReplaceTempView("graft_orders")
      T.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
      s.sql(
        """SELECT l_orderkey,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue,
          |  unix_timestamp(o_orderdate) div 86400 AS o_day
          |FROM graft_customer c
          |JOIN graft_orders o ON c.c_custkey = o.o_custkey
          |JOIN graft_lineitem l ON l.l_orderkey = o.o_orderkey
          |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1995-03-15'
          |GROUP BY l_orderkey, o_day
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    },

    // The typed Dataset[T] surface — case-class Encoders, lambda filter,
    // groupByKey + reduceGroups (an Aggregator under the hood: partial
    // merge runs map-side, so the shuffle still carries one tuple per
    // key). Sums stay in exact Long (quantity and linenumber are
    // integer-valued) so the typed fold is order-independent. Declared
    // deliberately: typed rows pay serialization vs columnar codegen —
    // the engine treats the typed API as a first-class surface but
    // reaches for it only where compile-time row types matter.
    "ds_typed" -> Q(
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(SUM(l_linenumber) AS BIGINT) AS sum_line, COUNT(*) AS n
        |FROM read_parquet('{sfDir}/lineitem.parquet')
        |WHERE l_quantity > 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import s.implicits._
      T.lineitem(s, d)
        .select("l_returnflag", "l_quantity", "l_linenumber")
        .as[LineSlice]
        .filter((x: LineSlice) => x.l_quantity > 10)
        .map((x: LineSlice) => (x.l_returnflag, x.l_quantity.toLong, x.l_linenumber.toLong, 1L))
        .groupByKey(_._1)
        .reduceGroups((a: (String, Long, Long, Long), b: (String, Long, Long, Long)) =>
          (a._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
        .map { case (k, (_, q, ln, n)) => (k, q, ln, n) }
        .toDF("l_returnflag", "sum_qty", "sum_line", "n")
        .orderBy("l_returnflag")
    }
  )

  /** Typed row for the ds_typed Dataset[T] query. */
  final case class LineSlice(l_returnflag: String, l_quantity: Double,
      l_linenumber: Int)
}
