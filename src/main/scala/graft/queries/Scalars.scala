package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Scalar function surface (SURVEY §2.8): string / regexp / date / math /
  * conditional / cast / array / json / map. All codegen'd built-ins —
  * no UDFs anywhere on this path.
  *
  * Dialect deltas handled per SURVEY §2.8's checklist: DuckDB lists are
  * 1-indexed (`element_at` is too — use it, not `[]`), `isodow` vs
  * `weekday`, `date_diff` arg order, DuckDB `regexp_replace` needs 'g',
  * DuckDB `ceil/floor` return DOUBLE (cast both sides), integer division
  * spelled `div` / `//`.
  */
object Scalars {

  val defs: Map[String, Q] = Map(

    "fn_string" -> Q(
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substring(p_name, 1, 5) AS sub5,
        |  length(p_name) AS len,
        |  replace(p_name, 'a', 'X') AS repl,
        |  lpad(p_brand, 12, '#') AS pad,
        |  p_brand || '/' || p_type AS cat,
        |  trim(' ' || p_name || ' ') AS trimmed,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM read_parquet('{sfDir}/part.parquet')
        |ORDER BY p_partkey""".stripMargin) {
      (s, d) => T.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub5"),
        length(col("p_name")).as("len"),
        expr("replace(p_name, 'a', 'X')").as("repl"),
        lpad(col("p_brand"), 12, "#").as("pad"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("cat"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
        element_at(split(col("p_name"), " "), 1).as("first_word"))
        .orderBy("p_partkey")
    },

    "fn_regexp" -> Q(
      """SELECT p_partkey,
        |  regexp_extract(p_name, '[a-z]+') AS first_tok,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS no_vowels,
        |  regexp_extract(p_brand, '[0-9]+') AS brand_num
        |FROM read_parquet('{sfDir}/part.parquet')
        |ORDER BY p_partkey""".stripMargin) {
      (s, d) => T.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "[a-z]+", 0).as("first_tok"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("no_vowels"),
        regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"))
        .orderBy("p_partkey")
    },

    "fn_date" -> Q(
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS dd,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        |  last_day(o_orderdate) AS month_end,
        |  isodow(o_orderdate) AS iso_dw
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) => T.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dd"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        datediff(to_date(lit("2000-01-01")), col("o_orderdate")).as("days_to_y2k"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        last_day(col("o_orderdate")).as("month_end"),
        // Spark weekday: Mon=0; DuckDB isodow: Mon=1 — normalize to ISO.
        (weekday(col("o_orderdate")) + 1).as("iso_dw"))
        .orderBy("o_orderkey")
    },

    "fn_math" -> Q(
      """SELECT p_partkey,
        |  CAST(round(p_retailprice, 0) AS BIGINT) AS rounded,
        |  abs(p_size - 20) AS dist20,
        |  CAST(ceil(p_retailprice / 7) AS BIGINT) AS ceil7,
        |  CAST(floor(p_retailprice / 7) AS BIGINT) AS floor7,
        |  sqrt(p_size) AS root,
        |  CAST(round(ln(p_retailprice), 6) AS DECIMAL(18,6)) AS logp,
        |  CAST(power(p_size, 2) AS BIGINT) AS sq,
        |  p_size % 7 AS m7,
        |  p_size // 3 AS d3
        |FROM read_parquet('{sfDir}/part.parquet')
        |ORDER BY p_partkey""".stripMargin) {
      (s, d) => T.part(s, d).select(
        col("p_partkey"),
        round(col("p_retailprice"), 0).cast(LongType).as("rounded"),
        abs(col("p_size") - 20).as("dist20"),
        ceil(col("p_retailprice") / 7).cast(LongType).as("ceil7"),
        floor(col("p_retailprice") / 7).cast(LongType).as("floor7"),
        sqrt(col("p_size")).as("root"),
        round(log(col("p_retailprice")), 6).cast(DecimalType(18, 6)).as("logp"),
        pow(col("p_size"), 2).cast(LongType).as("sq"),
        (col("p_size") % 7).as("m7"),
        expr("p_size div 3").as("d3"))
        .orderBy("p_partkey")
    },

    "fn_cond" -> Q(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'O' THEN 'open'
        |       WHEN o_orderstatus = 'F' THEN 'done'
        |       ELSE 'other' END AS status_word,
        |  COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'LOW!') AS prio,
        |  CASE WHEN o_totalprice > 250000 THEN 'big' ELSE 'small' END AS size_word
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) => T.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "F", "done")
          .otherwise("other").as("status_word"),
        coalesce(nullif(col("o_orderpriority"), lit("5-LOW")), lit("LOW!")).as("prio"),
        when(col("o_totalprice") > 250000, "big").otherwise("small").as("size_word"))
        .orderBy("o_orderkey")
    },

    "fn_cast" -> Q(
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(o_orderkey AS DOUBLE) AS key_dbl,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
        |FROM read_parquet('{sfDir}/orders.parquet')
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) => T.orders(s, d).select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        // double→bigint casts differ (Spark truncates, DuckDB rounds):
        // floor first on both sides.
        floor(col("o_totalprice")).cast(LongType).as("price_floor"),
        col("o_orderkey").cast("double").as("key_dbl"),
        to_date(col("o_orderdate")).cast("string").as("date_str"))
        .orderBy("o_orderkey")
    },

    "fn_array" -> Q(
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  embedding[1] AS first_f,
        |  embedding[64] AS last_f,
        |  embedding[2] AS mid_a,
        |  embedding[3] AS mid_b,
        |  embedding[4] AS mid_c,
        |  CAST(round(list_sum(embedding), 3) AS DECIMAL(18,3)) AS vsum
        |FROM read_parquet('{sfDir}/embeddings.parquet')
        |ORDER BY vec_id""".stripMargin) {
      (s, d) => T.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_f"),
        element_at(col("embedding"), 64).as("last_f"),
        // scalar columns, not a sliced array — the driver's pandas compare
        // cannot hash array cells (round-1 fn_array failure).
        element_at(col("embedding"), 2).as("mid_a"),
        element_at(col("embedding"), 3).as("mid_b"),
        element_at(col("embedding"), 4).as("mid_c"),
        expr("CAST(round(aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + x), 3) AS DECIMAL(18,3))")
          .as("vsum"))
        .orderBy("vec_id")
    },

    "fn_json" -> Q(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM read_parquet('{sfDir}/events.parquet')
        |ORDER BY event_id""".stripMargin) {
      (s, d) => T.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .orderBy("event_id")
    },

    "fn_map" -> Q(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_via_map
        |FROM read_parquet('{sfDir}/events.parquet')
        |ORDER BY event_id""".stripMargin) {
      (s, d) => T.events(s, d).select(
        col("event_id"),
        element_at(
          from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")),
          lit("k")).as("k_via_map"))
        .orderBy("event_id")
    }
  )
}
