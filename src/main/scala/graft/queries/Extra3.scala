package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-3+ additions (SURVEY §2.11c): exact distributed quantiles with a
  * sketch-accuracy check, deterministic mode, the ANSI try_* error-safe
  * function family; round 4 adds the end-to-end dedup pipeline
  * (dedup_keep_rep), an oracle-backed salted join, and the
  * digest/encoding scalar family. Same emission contract as everything
  * else — decimal internals, DOUBLE at the edge (SparkEntry.emitDoubles).
  */
object Extra3 {

  val defs: Map[String, Q] = Map(

    // The END-TO-END dedup pipeline a 100 TB training-data run actually
    // executes: MinHash+LSH candidate pairs (exact-verified Jaccard
    // ≥ 0.5) → connected components → keep the minimum doc_id per
    // cluster. Output is one row per SURVIVING document with its cluster
    // size — the "what do I actually keep" answer, composed entirely
    // from the scale-safe stages (banded LSH join, pointer-jumping
    // components; no all-pairs anywhere). Ground-truth oracle: DuckDB
    // recomputes the exact ≥ 0.5-Jaccard pair set via an inverted-index
    // self-join (the dedup_minhash oracle) and closes it transitively
    // with a recursive CTE — a hash fail means LSH dropped a true
    // near-dup OR the clustering mislabeled a component.
    "dedup_keep_rep" -> Q(
      """WITH RECURSIVE
        |w AS (SELECT doc_id, string_split(text, ' ') AS w
        |      FROM '{sfDir}/documents.parquet'),
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
        |       WHERE inter_n >= (z1.n + z2.n - inter_n) * 0.5),
        |sym AS (SELECT id1 AS s, id2 AS t FROM ed
        |        UNION ALL SELECT id2, id1 FROM ed),
        |reach(s, t) AS (
        |  SELECT doc_id, doc_id FROM w
        |  UNION
        |  SELECT r.s, sym.t FROM reach r JOIN sym ON r.t = sym.s),
        |lab AS (SELECT s AS doc_id, MIN(t) AS rep FROM reach GROUP BY s)
        |SELECT rep AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM lab GROUP BY rep ORDER BY keep_id""".stripMargin) {
      (s, d) =>
        val docs = T.documents(s, d).select("doc_id", "text")
        // The skinny (id1, id2) pair relation has exactly one consumer —
        // edgeComponents — which persists it internally (the LSH+verify
        // pipeline runs once; a caller-side persist would be redundant).
        val pairs = graft.ops.Sketches
          .minhashNearDups(docs, threshold = 0.5,
            stagedTag = Some(graft.Q.corpusTag(s, d, "documents")))
          .select("id1", "id2")
        // Components run ONLY over the near-dup subgraph (nodes that
        // appear in some pair — a tiny fraction of the corpus), via the
        // edges-only entry point: the label table it returns covers
        // exactly the pair-incident vertices (no union+distinct node
        // relation, no gate-count job — the optimistic bounded
        // union-find is the pipeline's FIRST materialization). Every
        // other document is trivially its own singleton cluster and
        // rejoins via one anti-join against the (persisted,
        // materialized) labels. At 100 TB this is the difference
        // between per-round shuffles over the candidate set and
        // per-round shuffles over the whole corpus.
        val labels = graft.ops.Components.edgeComponents(pairs)
        val clustered = labels
          .groupBy("rep").agg(count(lit(1)).as("n_docs"))
          .select(col("rep").as("keep_id"), col("n_docs"))
        val singles = docs.select(col("doc_id"))
          .join(labels, col("doc_id") === col("id"), "left_anti")
          .select(col("doc_id").as("keep_id"), lit(1L).as("n_docs"))
        clustered.union(singles).orderBy("keep_id")
    },

    // Skew-mitigation technique as a DECLARED, oracle-gated operation
    // (it was unit-only in ScaleTechniquesSpec): the probe side salts
    // its key by hash mod 8, the build side replicates across all 8
    // salts, the join runs on (key, salt) — a single hot key now lands
    // on 8 tasks instead of one. The shuffle_hash hint pins a shuffled
    // join (broadcasting the replicated side would defeat the exercise),
    // and the oracle is the PLAIN join — salting must be
    // result-invisible.
    "join_salted" -> Q(
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
        |FROM read_parquet('{sfDir}/orders.parquet') o
        |JOIN read_parquet('{sfDir}/customer.parquet') c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, d) =>
        val salts = 8
        val probe = T.orders(s, d)
          .withColumn("salt", pmod(hash(col("o_orderkey")), lit(salts)))
        val build = T.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))
          .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
        probe
          .join(build.hint("shuffle_hash"),
            probe("o_custkey") === build("c_custkey")
              && probe("salt") === build("salt"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            dec2(sum(dec2(col("o_totalprice")))).as("revenue"))
          .orderBy("c_mktsegment")
    },

    // Gaps-and-islands: per user, total active days and the longest run
    // of CONSECUTIVE days with events — the classic day - row_number()
    // island key, entirely in integer day numbers (epoch // 86400, the
    // Events time discipline — no date types cross the engines). Scale
    // shape: distinct + two windows/aggs all partitioned by user_id, one
    // shuffle reused throughout.
    "win_streaks" -> Q(
      """WITH d AS (SELECT DISTINCT user_id,
        |             CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day
        |           FROM read_parquet('{sfDir}/events.parquet')),
        |i AS (SELECT user_id, day,
        |        day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS isl
        |      FROM d),
        |s AS (SELECT user_id, isl, COUNT(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
        |       CAST(MAX(len) AS BIGINT) AS max_streak
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, d) =>
        val days = T.events(s, d)
          .select(col("user_id"),
            expr("unix_timestamp(ts_us) div 86400").as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        days.withColumn("isl", col("day") - row_number().over(w))
          .groupBy("user_id", "isl").agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(sum("len").as("n_days"), max("len").as("max_streak"))
          .orderBy("user_id")
    },

    // Shannon entropy of each event type's distribution across users — a
    // training-data diversity/quality metric (low entropy = traffic
    // concentrated in few users). Determinism: H = ln(n) - Σ nᵤ·ln(nᵤ)/n
    // where the Σ runs over EXACT decimals — each ln(nᵤ) is one scalar
    // double rounded once to 9 places (engine-agreement is per-scalar,
    // the fn_math precedent), and the weighted sum is exact decimal
    // arithmetic, so aggregation order can't drift the result. One
    // double division + one final round at the edge.
    "agg_entropy" -> Q(
      """WITH c AS (SELECT event_type, user_id, COUNT(*) AS cnt
        |           FROM read_parquet('{sfDir}/events.parquet')
        |           GROUP BY 1, 2),
        |t AS (SELECT event_type, SUM(cnt) AS n, COUNT(*) AS n_users,
        |        SUM(CAST(ROUND(ln(cnt), 9) AS DECIMAL(18,9))
        |            * CAST(cnt AS DECIMAL(10,0))) AS wsum
        |      FROM c GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |  CAST(n_users AS BIGINT) AS n_users,
        |  CAST(ROUND(ln(CAST(n AS DOUBLE))
        |             - CAST(wsum AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |       AS DECIMAL(18,6)) AS entropy
        |FROM t ORDER BY event_type""".stripMargin) {
      (s, d) =>
        T.events(s, d)
          .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
          .groupBy("event_type")
          .agg(sum("cnt").as("n"), count(lit(1)).as("n_users"),
            sum(round(log(col("cnt")), 9).cast(DecimalType(18, 9))
              * col("cnt").cast(DecimalType(10, 0))).as("wsum"))
          .select(col("event_type"), col("n").as("n_events"), col("n_users"),
            round(log(col("n").cast("double"))
              - col("wsum").cast("double") / col("n").cast("double"), 6)
              .cast(DecimalType(18, 6)).as("entropy"))
          .orderBy("event_type")
    },

    // Digest/encoding scalar family — content-hash keys (exact dedup,
    // cache keys, stable shard assignment) and wire encodings. Both
    // engines hash the UTF-8 bytes of p_name: md5/sha256 emit lowercase
    // hex, hex() uppercase, base64 per RFC 4648.
    "fn_binary" -> Q(
      """SELECT p_partkey,
        |  md5(p_name) AS h_md5,
        |  sha256(p_name) AS h_sha256,
        |  to_base64(encode(p_name)) AS b64,
        |  hex(encode(p_name)) AS hx
        |FROM '{sfDir}/part.parquet' ORDER BY p_partkey""".stripMargin) {
      (s, d) =>
        T.part(s, d).select(col("p_partkey"),
          md5(col("p_name").cast("binary")).as("h_md5"),
          sha2(col("p_name").cast("binary"), 256).as("h_sha256"),
          base64(col("p_name").cast("binary")).as("b64"),
          hex(col("p_name")).as("hx"))
          .orderBy("p_partkey")
    },

    // Exact discrete quantiles by integer rank arithmetic — value at row
    // ceil(q·n) of the sorted group, picked with row_number + a
    // conditional aggregate (ties in ORDER BY p don't affect the value
    // picked at a rank). approx_percentile (accuracy 10000) is then
    // hash-checked to land between the exact values at ranks
    // ceil(0.49·n) and ceil(0.51·n) — the rank-error contract of the
    // sketch (≤ n/10000 ≪ 0.01·n), stated by the oracle as TRUE, same
    // pattern as agg_approx_distinct's HLL bound.
    "agg_quantiles" -> Q(
      """WITH d AS (SELECT o_orderpriority,
        |             CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |           FROM '{sfDir}/orders.parquet'),
        |r AS (SELECT o_orderpriority, p,
        |        ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY p) AS rn,
        |        COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |      FROM d)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  MAX(CASE WHEN rn = (cnt + 1) // 2 THEN p END) AS p50_exact,
        |  MAX(CASE WHEN rn = (9 * cnt + 9) // 10 THEN p END) AS p90_exact,
        |  TRUE AS approx50_ok
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_orderpriority").orderBy("p")
        val cw = Window.partitionBy("o_orderpriority")
        T.orders(s, d)
          .select(col("o_orderpriority"), dec2(col("o_totalprice")).as("p"))
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(cw))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            max(when(expr("rn = (cnt + 1) div 2"), col("p"))).as("p50_exact"),
            max(when(expr("rn = (9 * cnt + 9) div 10"), col("p"))).as("p90_exact"),
            percentile_approx(col("p"), lit(0.5), lit(10000)).as("ap"),
            max(when(expr("rn = greatest((49 * cnt + 99) div 100, 1)"), col("p"))).as("lo"),
            max(when(expr("rn = least((51 * cnt + 99) div 100, cnt)"), col("p"))).as("hi"))
          .select(col("o_orderpriority"), col("n"),
            col("p50_exact"), col("p90_exact"),
            (col("ap") >= col("lo") && col("ap") <= col("hi")).as("approx50_ok"))
          .orderBy("o_orderpriority")
    },

    // Deterministic mode: most frequent brand per part-type class, ties
    // broken lexicographically — count+window on both engines, so the
    // result is well-defined where a bare mode() aggregate would be
    // engine-arbitrary.
    "agg_mode" -> Q(
      """WITH c AS (SELECT string_split(p_type, ' ')[1] AS t_class, p_brand,
        |             COUNT(*) AS cnt
        |           FROM '{sfDir}/part.parquet' GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY t_class
        |                 ORDER BY cnt DESC, p_brand) AS rn
        |      FROM c)
        |SELECT t_class, p_brand AS mode_brand, cnt AS mode_n
        |FROM r WHERE rn = 1 ORDER BY t_class""".stripMargin) {
      (s, d) =>
        val c = T.part(s, d)
          .select(expr("element_at(split(p_type, ' '), 1)").as("t_class"),
            col("p_brand"))
          .groupBy("t_class", "p_brand").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("t_class")
          .orderBy(col("cnt").desc, col("p_brand"))
        c.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("t_class"), col("p_brand").as("mode_brand"),
            col("cnt").as("mode_n"))
          .orderBy("t_class")
    },

    // PII redaction — the mask step of a training-data pipeline. The
    // documents table has no native PII, so both engines append the SAME
    // deterministic contact suffix (email + IPv4 derived from doc_id)
    // and then mask it: counts on the raw string, regexp_replace to
    // <EMAIL>/<IP>, and a hash-checked `clean` boolean proving no
    // pattern survives masking. Patterns stay in the Java∩RE2 common
    // subset (no lookaround, no backrefs); DuckDB needs the 'g' flag
    // where Spark replaces globally by default.
    "text_pii_mask" -> Q(
      """WITH d AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id ||
        |         '@mail.example.com from 10.0.' || (doc_id % 256) || '.7' AS raw_s
        |  FROM '{sfDir}/documents.parquet'),
        |m AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(raw_s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    len(regexp_extract_all(raw_s, '(\d{1,3}\.){3}\d{1,3}')) AS n_ip,
        |    regexp_replace(regexp_replace(raw_s,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '(\d{1,3}\.){3}\d{1,3}', '<IP>', 'g') AS masked
        |  FROM d)
        |SELECT doc_id, CAST(n_email AS INT) AS n_email, CAST(n_ip AS INT) AS n_ip,
        |  substring(masked, greatest(length(masked) - 39, 1), 40) AS tail,
        |  NOT (regexp_matches(masked, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
        |       OR regexp_matches(masked, '(\d{1,3}\.){3}\d{1,3}')) AS clean
        |FROM m ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipRe = "(\\d{1,3}\\.){3}\\d{1,3}"
        T.documents(s, d)
          .select(col("doc_id"),
            concat(col("text"), lit(" contact user"), col("doc_id"),
              lit("@mail.example.com from 10.0."), col("doc_id") % 256,
              lit(".7")).as("raw_s"))
          .select(col("doc_id"),
            regexp_count(col("raw_s"), lit(emailRe)).cast("int").as("n_email"),
            regexp_count(col("raw_s"), lit(ipRe)).cast("int").as("n_ip"),
            regexp_replace(regexp_replace(col("raw_s"), emailRe, "<EMAIL>"),
              ipRe, "<IP>").as("masked"))
          .select(col("doc_id"), col("n_email"), col("n_ip"),
            substring(col("masked"),
              greatest(length(col("masked")) - 39, lit(1)), lit(40)).as("tail"),
            (!(col("masked").rlike(emailRe) || col("masked").rlike(ipRe))).as("clean"))
          .orderBy("doc_id")
    },

    // Deterministic stratified sampling — exactly 10 events per type,
    // chosen by a pseudo-random but REPRODUCIBLE order: h(id) = id ·
    // 2654435761 mod 2³², a bijection on [0, 2³²) (odd multiplier), so
    // there are no ties and every engine/run picks the identical sample.
    // This is how a 100 TB pipeline samples eval slices: TABLESAMPLE is
    // neither deterministic nor stratified; a hash-ranked window top-N
    // per stratum is both, and shuffles only (type, h) pairs. The hash is
    // computed overflow-safely via 16-bit limbs (a·C mod 2³² = (a0·C +
    // ((a1·C) mod 2¹⁶)·2¹⁶) mod 2³², terms < 2⁴⁸): a naive id·C wraps
    // i64 above id ≈ 3.47e9 — Spark wraps silently (negative remainders,
    // bijection broken), DuckDB raises.
    "sample_stratified" -> Q(
      """SELECT event_type, event_id, smp_rank FROM (
        |  SELECT event_type, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY (((event_id % 4294967296) % 65536) * 2654435761
        |        + ((((event_id % 4294967296) // 65536) * 2654435761) % 65536)
        |        * 65536) % 4294967296) AS smp_rank
        |  FROM read_parquet('{sfDir}/events.parquet')) t
        |WHERE smp_rank <= 10
        |ORDER BY event_type, smp_rank""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("event_type")
          .orderBy(expr("(((event_id % 4294967296L) % 65536L) * 2654435761L" +
            " + ((((event_id % 4294967296L) DIV 65536L) * 2654435761L) % 65536L)" +
            " * 65536L) % 4294967296L"))
        T.events(s, d)
          .select(col("event_type"), col("event_id"),
            row_number().over(w).as("smp_rank"))
          .filter(col("smp_rank") <= 10)
          .orderBy("event_type", "smp_rank")
    },

    // Bitwise AGGREGATES (the scalar bitwise family is fn_bitwise):
    // bit_or accumulates a seen-bits mask, bit_and a common-bits mask,
    // bit_xor a parity fingerprint — all partial-aggregatable, so the
    // shuffle carries one long per group and phase.
    "agg_bits" -> Q(
      """SELECT c_nationkey,
        |  bit_or(c_custkey % 256) AS seen_mask,
        |  bit_and(c_custkey % 16 + 48) AS common_mask,
        |  bit_xor(c_custkey) AS parity_fp
        |FROM read_parquet('{sfDir}/customer.parquet')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) {
      (s, d) =>
        T.customer(s, d)
          .groupBy("c_nationkey")
          .agg(expr("bit_or(c_custkey % 256)").as("seen_mask"),
            expr("bit_and(c_custkey % 16 + 48)").as("common_mask"),
            expr("bit_xor(c_custkey)").as("parity_fp"))
          .orderBy("c_nationkey")
    },

    // URL parsing — Spark's parse_url family over a deterministic URL
    // derived from doc_id (documents carry no native URLs, the
    // text_pii_mask synthesis discipline). The oracle re-extracts the
    // same components with anchored regexps — constructed URLs are fully
    // regular, so the regexp statement is exact, not approximate.
    "fn_url" -> Q(
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://ex' || (doc_id % 5) || '.example.com/p/' || doc_id ||
        |    '?q=' || (doc_id % 7) || '&ref=mail' AS url
        |  FROM '{sfDir}/documents.parquet')
        |SELECT doc_id,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_param
        |FROM u ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            concat(lit("https://ex"), col("doc_id") % 5,
              lit(".example.com/p/"), col("doc_id"),
              lit("?q="), col("doc_id") % 7, lit("&ref=mail")).as("url"))
          .select(col("doc_id"),
            lower(parse_url(col("url"), lit("PROTOCOL"))).as("scheme"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY")).as("query"),
            parse_url(col("url"), lit("QUERY"), lit("q")).as("q_param"))
          .orderBy("doc_id")
    },

    // ANSI error-safe function family: try_divide / try_cast /
    // try_add / try_element_at all yield NULL where strict evaluation
    // would raise. DuckDB's native semantics already NULL on /0, failed
    // TRY_CAST, and out-of-range list extracts; the bigint-overflow add
    // has no DuckDB TRY twin, so the oracle states its result directly
    // (NULL except the p_partkey = 0 row, where max-long + 0 fits).
    "fn_try" -> Q(
      """SELECT p_partkey,
        |  ROUND(p_retailprice, 4) / (p_size - p_size) AS div0,
        |  ROUND(CAST(p_retailprice AS DOUBLE) / p_size, 4) AS ratio,
        |  TRY_CAST(substr(p_type, 1, 3) AS INT) AS bad_int,
        |  TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS size_again,
        |  CASE WHEN p_partkey = 0 THEN 9223372036854775807 END AS ovf,
        |  string_split(p_type, ' ')[9] AS word9
        |FROM '{sfDir}/part.parquet' ORDER BY p_partkey""".stripMargin) {
      (s, d) =>
        T.part(s, d).select(col("p_partkey"),
          expr("try_divide(round(p_retailprice, 4), p_size - p_size)").as("div0"),
          round(expr("try_divide(CAST(p_retailprice AS DOUBLE), CAST(p_size AS DOUBLE))"), 4).as("ratio"),
          expr("try_cast(substring(p_type, 1, 3) AS INT)").as("bad_int"),
          expr("try_cast(CAST(p_size AS STRING) AS INT)").as("size_again"),
          expr("try_add(9223372036854775807L, p_partkey)").as("ovf"),
          expr("try_element_at(split(p_type, ' '), 9)").as("word9"))
          .orderBy("p_partkey")
    }
  )
}
