package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.native
import org.apache.spark.sql.types.IntegerType

/** Round-10 additions, part 9: text canonicalization (the normalize-
  * before-hash step every dedup pipeline runs, on a native NFC
  * expression — Spark has no built-in), URL canonicalization dedup (the
  * web-crawl flavor of the same idea), calendar/interval arithmetic
  * (the date functions the fn_date/fn_datefmt rows don't touch), and
  * the IDENTIFIER() clause (parameterized table names — the companion
  * to sql_params' parameterized VALUES).
  */
object Extra19 {

  val defs: Map[String, Q] = Map(

    // TEXT NORMALIZATION — Unicode NFC + casefold + whitespace collapse
    // + trim, the canonicalization every exact-dedup/shingle pipeline
    // applies BEFORE hashing: "é" arrives both precomposed (U+00E9) and
    // decomposed (U+0065 U+0301) — byte-distinct, render-identical —
    // and raw xxhash64/fingerprint dedup silently splits equal texts
    // until NFC folds them. The fixture text is ASCII, so the unicode
    // pressure is synthesized deterministically: alternating docs
    // (doc_id DIV 20 parity — doc_ids step by 20 within a source, so
    // the parity MIXES inside every group; plain doc_id % 2 is constant
    // per source and would gate nothing) get the precomposed vs the
    // decomposed spelling of the same header word. The gate: raw heads
    // are 2 distinct strings per source, normalized heads are 1, and
    // the per-doc char-length delta counts exactly the composition
    // (+1 per decomposed doc) and whitespace (+2 per doc) folds.
    // Normalization runs in the native UnicodeNormalize expression —
    // codegen'd, allocation-free on already-NFC rows (the overwhelming
    // common case at corpus scale), never a row UDF. DuckDB replays it
    // with nfc_normalize; regexp_replace needs the explicit 'g' flag
    // there (Spark's is always global).
    "text_normalize" -> Q(
      """WITH t AS (SELECT source,
        |    concat(CASE WHEN (doc_id // 20) % 2 = 0 THEN 'Caf' || chr(233)
        |                ELSE 'Cafe' || chr(769) END,
        |           '  ', text, ' ') AS raw
        |  FROM read_parquet('{sfDir}/documents.parquet')),
        |n AS (SELECT source, raw,
        |    trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g')) AS norm
        |  FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT substr(raw, 1, 4)) AS BIGINT) AS raw_heads,
        |  CAST(count(DISTINCT substr(norm, 1, 4)) AS BIGINT) AS norm_heads,
        |  CAST(sum(length(raw) - length(norm)) AS BIGINT) AS chars_removed
        |FROM n GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      // the heads are Scala literals, not chr(): Spark's chr() is mod-256
      // ASCII-only (chr(769) wraps to a control byte), unlike DuckDB's
      // code-point chr(769) = the combining acute
      val t = T.documents(s, d).select(col("source"),
        concat(
          when(expr("(doc_id DIV 20) % 2 = 0"), lit("Caf\u00e9"))
            .otherwise(lit("Cafe\u0301")),
          lit("  "), col("text"), lit(" ")).as("raw"))
      val n = t.select(col("source"), col("raw"),
        trim(regexp_replace(
          lower(native.normalize_unicode(col("raw"), "NFC")),
          "\\s+", " ")).as("norm"))
      n.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          countDistinct(substring(col("raw"), 1, 4)).as("raw_heads"),
          countDistinct(substring(col("norm"), 1, 4)).as("norm_heads"),
          sum(length(col("raw")) - length(col("norm"))).as("chars_removed"))
        .orderBy("source")
    },

    // URL CANONICALIZATION DEDUP — the web-crawl twin of
    // text_normalize: the same resource arrives under host-case,
    // default-port, utm-tracking-param, trailing-slash and fragment
    // variants, and crawl dedup runs on the CANONICAL url, never the
    // raw one. Five raw variants per resource are synthesized
    // deterministically from the order key (host casing / :443 / plain
    // on k%3; utm_source-prefixed vs utm_campaign-suffixed query on
    // k%2; '#top' on k%4; trailing slash on k%5 — all five collapse,
    // while ref=, the MEANINGFUL param, is a function of the resource
    // id and survives). Canonicalization is pure map-side regex —
    // lowercase host (port drops with it: the synth only uses https'
    // default 443; a general canonicalizer keeps non-default ports),
    // strip trailing slash, strip utm_* params then the orphaned '&',
    // drop the fragment — then ONE groupBy(url): at crawl scale this
    // is exact dedup on a canonical key, the same hash-bucketed shape
    // as dedup_exact. The gate counts rows AND distinct raw forms per
    // canonical group, so a canonicalization step that under- or
    // over-merges shifts both columns.
    "dedup_url" -> Q(
      """WITH r AS (SELECT concat('https://',
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'Shop.Example.com'
        |         WHEN o_orderkey % 3 = 1 THEN 'shop.example.com:443'
        |         ELSE 'shop.example.com' END,
        |    '/p/', CAST(o_orderkey // 5 AS VARCHAR),
        |    CASE WHEN o_orderkey % 5 = 0 THEN '/' ELSE '' END,
        |    CASE WHEN o_orderkey % 2 = 0
        |         THEN concat('?utm_source=feed&ref=', CAST((o_orderkey // 5) % 3 AS VARCHAR))
        |         ELSE concat('?ref=', CAST((o_orderkey // 5) % 3 AS VARCHAR), '&utm_campaign=x') END,
        |    CASE WHEN o_orderkey % 4 = 0 THEN '#top' ELSE '' END) AS raw
        |  FROM read_parquet('{sfDir}/orders.parquet')),
        |p AS (SELECT raw,
        |  lower(regexp_extract(raw, '^https://([^/:?#]+)', 1)) AS host_c,
        |  regexp_replace(regexp_extract(raw, '^https://[^/?#]+(/[^?#]*)', 1), '/$', '') AS path_c,
        |  regexp_replace(regexp_replace(regexp_extract(raw, '\?([^#]*)', 1),
        |                 '(^|&)utm_[^&]*', '', 'g'), '^&', '') AS q_c
        |  FROM r),
        |k AS (SELECT raw, concat('https://', host_c, path_c,
        |        CASE WHEN q_c <> '' THEN concat('?', q_c) ELSE '' END) AS url FROM p)
        |SELECT url, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT raw) AS BIGINT) AS n_raw
        |FROM k GROUP BY url ORDER BY url""".stripMargin) { (s, d) =>
      val r = T.orders(s, d).select(expr(
        """concat('https://',
          |  CASE WHEN o_orderkey % 3 = 0 THEN 'Shop.Example.com'
          |       WHEN o_orderkey % 3 = 1 THEN 'shop.example.com:443'
          |       ELSE 'shop.example.com' END,
          |  '/p/', CAST(o_orderkey DIV 5 AS STRING),
          |  CASE WHEN o_orderkey % 5 = 0 THEN '/' ELSE '' END,
          |  CASE WHEN o_orderkey % 2 = 0
          |       THEN concat('?utm_source=feed&ref=', CAST((o_orderkey DIV 5) % 3 AS STRING))
          |       ELSE concat('?ref=', CAST((o_orderkey DIV 5) % 3 AS STRING), '&utm_campaign=x') END,
          |  CASE WHEN o_orderkey % 4 = 0 THEN '#top' ELSE '' END)""".stripMargin).as("raw"))
      val p = r.select(col("raw"),
        lower(regexp_extract(col("raw"), "^https://([^/:?#]+)", 1)).as("host_c"),
        regexp_replace(
          regexp_extract(col("raw"), "^https://[^/?#]+(/[^?#]*)", 1),
          "/$", "").as("path_c"),
        regexp_replace(
          regexp_replace(regexp_extract(col("raw"), "\\?([^#]*)", 1),
            "(^|&)utm_[^&]*", ""),
          "^&", "").as("q_c"))
      p.select(col("raw"),
          concat(lit("https://"), col("host_c"), col("path_c"),
            when(col("q_c") =!= "", concat(lit("?"), col("q_c")))
              .otherwise(lit(""))).as("url"))
        .groupBy("url")
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("raw")).as("n_raw"))
        .orderBy("url")
    },

    // CALENDAR / INTERVAL ARITHMETIC — the date functions the existing
    // fn_date/fn_datefmt rows never touch: month addition with the
    // end-of-month CLAMP (Jan 31 + 1 month = Feb 28 — the semantic both
    // engines share and naive day-arithmetic gets wrong), last_day,
    // next_day (first Monday STRICTLY after — the oracle reconstructs
    // it from DuckDB's Sunday=0 dayofweek as d + ((7-dow) % 7 + 1)),
    // quarter truncation, and whole-month / day distances. The
    // months_between operand is month-truncated on purpose: both
    // operands on day 1 makes Spark's 31-day-fraction formula exactly
    // integral, which is the only form a different engine can replay
    // verbatim (the fractional case bakes in Spark's Oracle-inherited
    // /31 convention). All map-side scalar work; the key-mod filter
    // bounds the declared output, not the computation shape.
    "fn_interval" -> Q(
      """WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
        |  FROM read_parquet('{sfDir}/orders.parquet') WHERE o_orderkey % 97 = 0)
        |SELECT o_orderkey, d AS o_orderdate,
        |  CAST(d + INTERVAL 2 MONTH AS DATE) AS plus_2m,
        |  last_day(d) AS eom,
        |  CAST(d + ((7 - dayofweek(d)) % 7 + 1) * INTERVAL 1 DAY AS DATE) AS next_mon,
        |  CAST(date_trunc('quarter', d) AS DATE) AS qtr,
        |  CAST(date_diff('month', DATE '1992-01-01', date_trunc('month', d)) AS INT) AS m_since,
        |  CAST(date_diff('day', DATE '1992-01-01', d) AS INT) AS d_since
        |FROM t ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val epoch = lit(java.sql.Date.valueOf("1992-01-01"))
      T.orders(s, d).filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
        .select(col("o_orderkey"), col("d").as("o_orderdate"),
          add_months(col("d"), 2).as("plus_2m"),
          last_day(col("d")).as("eom"),
          next_day(col("d"), "MO").as("next_mon"),
          trunc(col("d"), "quarter").as("qtr"),
          months_between(trunc(col("d"), "MM"), epoch)
            .cast(IntegerType).as("m_since"),
          datediff(col("d"), epoch).as("d_since"))
        .orderBy("o_orderkey")
    },

    // IDENTIFIER() — Spark 4's parameterized-identifier clause, the
    // companion to sql_params: values bind through :named markers, but
    // a TABLE NAME is an identifier position, which naive string
    // splicing handles with injection risk and :params cannot handle
    // at all (the parser needs an identifier, not a literal).
    // IDENTIFIER(:t) is the supported safe path a multi-tenant query
    // service uses to route the same statement across per-tenant
    // tables. The pin: the bound form is answer-identical to the
    // oracle's inlined table scan.
    "sql_identifier" -> Q(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
        |FROM read_parquet('{sfDir}/orders.parquet') WHERE o_custkey < 100
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      T.orders(s, d).createOrReplaceTempView("graft_ident_orders")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n, MIN(o_orderkey) AS min_key
          |FROM IDENTIFIER(:t) WHERE o_custkey < :c
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
        Map("t" -> "graft_ident_orders", "c" -> Integer.valueOf(100)))
    }
  )
}
