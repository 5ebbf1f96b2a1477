package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Round-6 additions (SURVEY §2.11f): three more training-data-pipeline
  * operations a 100 TB run needs between dedup and tokenization —
  * temperature-based language rebalancing, a corpus-statistics quality
  * signal (unigram surprisal), and the cross-source contamination
  * matrix. Determinism follows the established contracts: libm
  * functions only where parity is gate-verified (sqrt — fn_geo; ln —
  * same class), every transcendental quantized ONCE via floor(x·10ⁿ)
  * into BIGINT units (the ts_interp lesson: ROUND-on-double diverges,
  * floor-after-one-multiply does not), all sums exact integers.
  */
object Extra7 {

  val defs: Map[String, Q] = Map(

    // Temperature sampling (the data-mixing step of multilingual
    // training runs, α = 0.5): per-language keep-rates ∝ sqrt(share),
    // so low-resource languages are up-weighted relative to their
    // corpus share. rate_l = min(1, (N/2)·sqrt(n_l) / (Σ√n · n_l)) —
    // expected kept ≈ N/2 distributed ∝ √n_l. Determinism: each
    // per-language sqrt is quantized ONCE to integer millionths and
    // Σ√n is an EXACT BIGINT sum (a raw double sum would be
    // merge-order-dependent — the non-associativity class the file
    // header bans); the admission hash keeps its multiply inside int64
    // for the full doc_id domain via the inner mod (the sample_split
    // overflow lesson) and compares against the floor-quantized
    // millionths threshold: bit-identical in both engines, stable
    // under any partitioning (NOT rand() — resampling must be
    // reproducible). Scale shape: two tiny language-level aggregates
    // broadcast back, one map-side filter over the corpus, one rollup
    // — the corpus itself is scanned once and never shuffled.
    "sample_temperature" -> Q(
      """WITH c AS (SELECT lang, COUNT(*) AS n
        |           FROM read_parquet('{sfDir}/documents.parquet') GROUP BY lang),
        |t AS (SELECT CAST(SUM(CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS su,
        |             CAST(SUM(n) AS BIGINT) AS total FROM c),
        |r AS (SELECT lang, n,
        |        CAST(FLOOR(LEAST(
        |          (CAST(total AS DOUBLE) / 2) * sqrt(CAST(n AS DOUBLE))
        |            / ((CAST(su AS DOUBLE) / 1000000) * CAST(n AS DOUBLE)),
        |          1.0) * 1000000) AS BIGINT) AS thr
        |      FROM c, t)
        |SELECT d.lang, CAST(MAX(r.n) AS BIGINT) AS n_docs, r.thr AS thr,
        |       CAST(SUM(CASE WHEN ((d.doc_id % 2147483647) * 2654435761) % 1000000 < r.thr
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM read_parquet('{sfDir}/documents.parquet') d
        |JOIN r ON d.lang = r.lang
        |GROUP BY d.lang, r.thr ORDER BY d.lang""".stripMargin) { (s, d) =>
      val docs = T.documents(s, d).select("doc_id", "lang")
      val c = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val t = c.agg(
        sum(floor(sqrt(col("n").cast("double")) * 1000000).cast("long")).as("su"),
        sum("n").as("total"))
      val r = c.crossJoin(broadcast(t))
        .select(col("lang"), col("n"),
          expr("""cast(floor(least(
                 |  (cast(total as double) / 2) * sqrt(cast(n as double))
                 |    / ((cast(su as double) / 1000000) * cast(n as double)),
                 |  1.0D) * 1000000) as bigint)"""
            .stripMargin).as("thr"))
      docs.join(broadcast(r), "lang")
        .groupBy("lang", "thr")
        .agg(max(col("n")).as("n_docs"),
          sum(when(graft.Q.admissionHash(col("doc_id"), 1000000L)
            < col("thr"), 1).otherwise(0)).as("n_kept"))
        .select(col("lang"), col("n_docs"), col("thr"), col("n_kept"))
        .orderBy("lang")
    },

    // Unigram surprisal (the CCNet-style perplexity-proxy quality
    // filter): each token scores −ln(count(word)/Σcounts) against the
    // corpus's OWN unigram model, quantized once to integer nano-nats;
    // documents sum exactly, sources roll up doc counts, token counts,
    // total units, and how many docs exceed 9.5 nats/token (≈ the
    // "implausible text" cut). The ln runs once per DISTINCT word on
    // the frequency table, not per occurrence. Scale shape: one explode
    // pass, a word-keyed count (the shuffle carries one row per
    // distinct word), a word-keyed join back (AQE broadcasts the vocab
    // when it fits; at full scale it is the classic skewed equi-join —
    // the join_salted / AQE-skew machinery applies), two keyed rollups.
    "text_surprisal" -> Q(
      """WITH w AS (
        |  SELECT source, doc_id,
        |         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
        |  FROM read_parquet('{sfDir}/documents.parquet')),
        |f AS (SELECT word, COUNT(*) AS nw FROM w GROUP BY word),
        |t AS (SELECT CAST(SUM(nw) AS BIGINT) AS ntot FROM f),
        |u AS (SELECT word,
        |        CAST(FLOOR((ln(CAST(ntot AS DOUBLE)) - ln(CAST(nw AS DOUBLE)))
        |                   * 1000000000) AS BIGINT) AS u
        |      FROM f, t),
        |d AS (SELECT source, doc_id, COUNT(*) AS n_tok, SUM(u.u) AS sum_u
        |      FROM w JOIN u USING (word) GROUP BY source, doc_id)
        |SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(SUM(sum_u) AS BIGINT) AS sum_units,
        |       CAST(SUM(CASE WHEN sum_u > n_tok * 9500000000 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_high
        |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      // The exploded token stream feeds TWO branches (the frequency
      // aggregation and the per-doc scoring join) whose exchange
      // subtrees differ, so exchange reuse cannot dedup them — persist
      // the skinny (source, doc_id, word) relation so the corpus is
      // scanned and exploded once, the dedup_minhash single-scan
      // discipline (CacheScope releases it).
      val w = T.documents(s, d)
        .select(col("source"), col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .transform(graft.Q.sketchPersist)
      val f = w.groupBy("word").agg(count(lit(1)).as("nw"))
      val t = f.agg(sum("nw").as("ntot"))
      val u = f.crossJoin(broadcast(t))
        .select(col("word"),
          expr("""cast(floor((ln(cast(ntot as double)) - ln(cast(nw as double)))
                 |  * 1000000000) as bigint)""".stripMargin).as("u"))
      val perDoc = w.join(u, "word")
        .groupBy("source", "doc_id")
        .agg(count(lit(1)).as("n_tok"), sum("u").as("sum_u"))
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("n_tokens"),
          sum("sum_u").as("sum_units"),
          sum(when(col("sum_u") > col("n_tok") * lit(9500000000L), 1)
            .otherwise(0)).as("n_high"))
        .orderBy("source")
    },

    // JDBC source round-trip (the scan_csv pattern applied to database
    // federation): a fixture slice is written to an embedded Derby
    // database over plain JDBC, read back through Spark's JDBC source
    // as a PARTITIONED scan — partitionColumn/bounds/numPartitions, the
    // cluster idiom where each executor fetches its own key range
    // instead of one task draining the whole table — and aggregated;
    // the oracle aggregates the ORIGINAL parquet, so the hash gate
    // asserts the values survived the database round-trip exactly.
    // (Derby stands in for any JDBC warehouse; the ClickHouse sink
    // shares this exact seam — SURVEY §7 risk 5.)
    "scan_jdbc" -> Q(
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM read_parquet('{sfDir}/documents.parquet')
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      // per-JVM in-memory DB (the Extra6 staging-dir discipline): no
      // cross-process races, stable within a process so bench pass 2
      // overwrites pass 1.
      val url = s"jdbc:derby:memory:graftscan_${graft.Q.perJvmId};create=true"
      val docs = T.documents(s, d).select("doc_id", "lang", "n_chars")
      docs.write.mode("overwrite")
        .option("createTableColumnTypes", "lang VARCHAR(16)")
        .jdbc(url, "GRAFT_DOCS", new java.util.Properties())
      // coalesce: max over an empty slice is null — bounds degrade to
      // [0, 1) and the read returns empty instead of NPEing here.
      val mx = docs.agg(coalesce(max("doc_id"), lit(0L))).head().getLong(0)
      s.read.format("jdbc")
        .option("url", url).option("dbtable", "GRAFT_DOCS")
        .option("partitionColumn", "doc_id")
        .option("lowerBound", "0").option("upperBound", (mx + 1).toString)
        .option("numPartitions", "4")
        .load()
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"), sum("doc_id").as("sum_ids"))
        .orderBy("lang")
    },

    // Deterministic per-group sampling — k docs per language, chosen by
    // the k SMALLEST values of a deterministic integer hash (the
    // order-statistics form of reservoir sampling, made reproducible:
    // same corpus → same sample, any partitioning, any run). The inner
    // mod keeps the multiply inside int64 for the FULL doc_id domain
    // (the sample_split overflow lesson). Runs on the custom
    // TopKPerGroupPlan bounded-heap operator — k rows of state per
    // language, no per-group sort, no window — the same exec that
    // serves ANN shortlisting; the oracle replays the selection as a
    // rank window under the identical (h, doc_id) total order.
    "sample_pergroup" -> Q(
      """WITH h AS (
        |  SELECT lang, doc_id,
        |         ((doc_id % 2147483647) * 2654435761) % 1000000007 AS h
        |  FROM read_parquet('{sfDir}/documents.parquet')),
        |r AS (SELECT lang, doc_id, h,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        |      FROM h)
        |SELECT lang, doc_id, CAST(h AS BIGINT) AS h
        |FROM r WHERE rn <= 10 ORDER BY lang, doc_id""".stripMargin) { (s, d) =>
      val h = T.documents(s, d).select(col("lang"), col("doc_id"),
        graft.Q.admissionHash(col("doc_id"), 1000000007L).as("h"))
      org.apache.spark.sql.graft.native.top_k_per_group(h, Seq("lang"),
        Seq(col("h").asc, col("doc_id").asc), 10)
        .orderBy("lang", "doc_id")
    },

    // Cross-source contamination matrix — near-dup pairs BETWEEN
    // sources (the "how much of source A leaked into source B"
    // question every corpus audit asks; the diagonal is within-source
    // redundancy). Pair generation is the same scale-safe MinHash+LSH
    // + exact-verify pipeline as dedup_minhash; sources attach to the
    // skinny (id1, id2) pairs via two doc-keyed joins and roll up on
    // the unordered source pair. Ground-truth oracle: DuckDB
    // recomputes the exact ≥0.5-Jaccard pair set via its
    // inverted-index self-join — a hash fail means LSH dropped a true
    // cross-source near-dup. Perf floor (r13): this query IS
    // minhashNearDups (dedup_minhash's whole pipeline, ~1.0 s at
    // sf0.1) plus two broadcast attaches and a ≤|sources|²-row rollup
    // — its driver-visible time tracks dedup_minhash's by
    // construction; any future cut lands in ops/Sketches, not here.
    "dedup_cross_source" -> Q(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM '{sfDir}/documents.parquet'),
        |s AS (SELECT doc_id, list_distinct(
        |        [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS sh
        |      FROM w WHERE len(w) >= 3),
        |e0 AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter_n
        |      FROM e0 a JOIN e0 b ON a.g = b.g AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |z AS (SELECT doc_id, len(sh) AS n FROM s),
        |ed AS (SELECT id1, id2
        |       FROM p JOIN z z1 ON z1.doc_id = id1 JOIN z z2 ON z2.doc_id = id2
        |       WHERE inter_n >= (z1.n + z2.n - inter_n) * 0.5)
        |SELECT LEAST(d1.source, d2.source) AS src_a,
        |       GREATEST(d1.source, d2.source) AS src_b,
        |       COUNT(*) AS n_pairs
        |FROM ed
        |JOIN read_parquet('{sfDir}/documents.parquet') d1 ON d1.doc_id = ed.id1
        |JOIN read_parquet('{sfDir}/documents.parquet') d2 ON d2.doc_id = ed.id2
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val docs = T.documents(s, d)
      val pairs = graft.ops.Sketches
        .minhashNearDups(docs.select("doc_id", "text"), threshold = 0.5,
          stagedTag = Some(graft.Q.corpusTag(s, d, "documents")))
        .select("id1", "id2")
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id1"), col("source").as("s1")), "id1")
        .join(src.select(col("doc_id").as("id2"), col("source").as("s2")), "id2")
        .select(least(col("s1"), col("s2")).as("src_a"),
          greatest(col("s1"), col("s2")).as("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
        .orderBy("src_a", "src_b")
    }
  )
}
