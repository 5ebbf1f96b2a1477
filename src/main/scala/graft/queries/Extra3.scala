package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-3 additions (SURVEY §2.11c): exact distributed quantiles with a
  * sketch-accuracy check, deterministic mode, and the ANSI try_* error-
  * safe function family. Same emission contract as everything else —
  * decimal internals, DOUBLE at the edge (SparkEntry.emitDoubles).
  */
object Extra3 {

  val defs: Map[String, Q] = Map(

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
