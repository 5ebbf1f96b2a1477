package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._

/** Round-5 batch 2 (SURVEY §2.11e): source-format coverage beyond
  * parquet. Each scan_* query materializes a deterministic copy of a
  * fixture table in the target format under /tmp (mode=overwrite — the
  * write is part of the declared pipeline), reads it back through the
  * corresponding Spark source, and aggregates; the oracle computes the
  * same aggregate from the original parquet, so the hash gate asserts
  * the FORMAT ROUND-TRIP is lossless, not just that the reader runs.
  * All aggregates are format-stable values (integers, strings, exact
  * decimals from text-roundtrippable doubles).
  */
object Extra6 {

  /** Spark 4's distribution ships the full Avro FileFormat inside
    * spark-sql itself but WITHOUT the spark-avro module's service
    * registration (no META-INF entry, no AvroDataSourceV2), so the
    * "avro" short name fails lookup while the implementation class
    * loads fine — address it by fully-qualified name.
    */
  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Fail with the documented story if a Spark upgrade moves/renames the
    * internal class (it is NOT a public API — no service registration in
    * 4.1.2), instead of an opaque ClassNotFound mid-query (ADVICE r9).
    */
  private def avroFmtChecked: String = {
    try Class.forName(AvroFmt)
    catch {
      case e: ClassNotFoundException => throw new IllegalStateException(
        s"$AvroFmt not found: Spark 4.1.2 bundled the Avro FileFormat " +
          "inside spark-sql WITHOUT service registration, so scan_avro " +
          "addresses it by implementation class; this Spark build moved " +
          "or renamed it — re-point AvroFmt (or use format(\"avro\") if " +
          "the build ships spark-avro's registration)", e)
    }
    AvroFmt
  }

  /** Per-SF, per-JVM staging dir for a format round-trip — the shared
    * [[Q.stageDir]] recipe (rationale there); stale dirs from dead JVMs
    * are bounded by /tmp lifetime.
    */
  private def stage(d: String, fmt: String): String =
    Q.stageDir("graft_fmt", d, fmt)

  val defs: Map[String, Q] = Map(

    // CSV source: header + explicit schema (never inferSchema on a real
    // pipeline — one pass saved and no type drift). The round-trip is
    // nation (ints + strings), joined back to the region dim and rolled
    // up — proving values survived the text format byte-exactly.
    "scan_csv" -> Q(
      """SELECT r.r_name, COUNT(*) AS n_nations,
        |       CAST(SUM(n.n_nationkey) AS BIGINT) AS sum_key
        |FROM read_parquet('{sfDir}/nation.parquet') n
        |JOIN read_parquet('{sfDir}/region.parquet') r
        |  ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin) { (s, d) =>
      val dir = stage(d, "csv")
      val nation = T.nation(s, d)
      nation.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(dir)
      val back = s.read.option("header", "true").schema(nation.schema).csv(dir)
      back.join(T.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_nations"),
          sum(col("n_nationkey").cast("long")).as("sum_key"))
        .orderBy("r_name")
    },

    // JSON-lines source with explicit schema. Doubles survive the text
    // round-trip because Spark serializes them in shortest-roundtrip
    // form — but the gate still casts to DECIMAL(18,2) before summing,
    // the same belt-and-braces every money aggregate wears.
    "scan_json" -> Q(
      """SELECT s_nationkey, COUNT(*) AS n_sup,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_bal
        |FROM read_parquet('{sfDir}/supplier.parquet')
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, d) =>
      val dir = stage(d, "json")
      val sup = T.supplier(s, d)
      sup.coalesce(1).write.mode("overwrite").json(dir)
      s.read.schema(sup.schema).json(dir)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_sup"),
          dec2(sum(dec2(col("s_acctbal")))).as("sum_bal"))
        .orderBy("s_nationkey")
    },

    // Avro source — the ROW-oriented interchange format (Kafka payloads,
    // schema-registry pipelines). Spark 4's distribution bundles the
    // Avro datasource inside spark-sql itself (verified: AvroFileFormat
    // resolves from spark-sql_2.13-4.1.2.jar — earlier rounds recorded
    // this as environment-blocked when only avro-core was present).
    // Same lossless round-trip contract as the other scan_* gates:
    // customer staged as .avro, read back, keyed rollup with exact
    // decimal sums; the oracle aggregates the ORIGINAL parquet. Doubles
    // survive Avro exactly (IEEE754 binary encoding, no text round
    // trip), and the DECIMAL cast happens after read-back — a lossy
    // format would hash-mismatch.
    "scan_avro" -> Q(
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_bal
        |FROM read_parquet('{sfDir}/customer.parquet')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val dir = stage(d, "avro")
      val fmt = avroFmtChecked
      T.customer(s, d).select("c_mktsegment", "c_acctbal")
        .write.mode("overwrite").format(fmt).save(dir)
      s.read.format(fmt).load(dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          dec2(sum(dec2(col("c_acctbal")))).as("sum_bal"))
        .orderBy("c_mktsegment")
    },

    // Plain-text source — the line-oriented format raw crawl/log corpora
    // arrive in (one record per line, a single string column). Round
    // trip: every document's text written as one line, read back via
    // spark.read.text, and the corpus-level length stats must match the
    // original parquet exactly — a gate that catches any line-splitting,
    // trailing-whitespace, or encoding mangling in the writer/reader
    // pair. Line-format caveats handled explicitly: a NULL document is
    // written as an empty line and reads back as '' — so BOTH sides
    // measure coalesce(text, ''), keeping the round-trip well-defined;
    // embedded line terminators (\n AND bare \r — the Hadoop line
    // reader splits on either) would change n_docs, so the fixture's
    // terminator-free text is a precondition — a corpus with embedded
    // terminators belongs on the json/parquet path.
    "scan_text" -> Q(
      """SELECT COUNT(*) AS n_docs,
        |       CAST(SUM(length(coalesce(text, ''))) AS BIGINT) AS sum_len,
        |       CAST(MIN(length(coalesce(text, ''))) AS BIGINT) AS min_len,
        |       CAST(MAX(length(coalesce(text, ''))) AS BIGINT) AS max_len
        |FROM read_parquet('{sfDir}/documents.parquet')""".stripMargin) { (s, d) =>
      val dir = stage(d, "text")
      T.documents(s, d).select(coalesce(col("text"), lit("")).as("text"))
        .write.mode("overwrite").text(dir)
      s.read.text(dir)
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("value"))).as("sum_len"),
          min(length(col("value"))).cast("long").as("min_len"),
          max(length(col("value"))).cast("long").as("max_len"))
    },

    // ORC source — the columnar alternative; binary-exact by nature, so
    // the round-trip covers the reader/writer pair and shows the engine
    // is not parquet-monogamous.
    "scan_orc" -> Q(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val dir = stage(d, "orc")
      T.orders(s, d).select("o_orderpriority", "o_totalprice")
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          dec2(sum(dec2(col("o_totalprice")))).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    // Partition pruning over a Hive-style partitioned layout — THE table
    // layout of a 100 TB warehouse: data written partitionBy(priority),
    // read back with a partition predicate. Catalyst turns the filter
    // into PartitionFilters (plan-pinned in PlanSpec), so only 1 of 5
    // directory subtrees is ever listed or read — pruning that happens
    // before any I/O, unlike row-group PushedFilters. The oracle
    // computes the same aggregate from the unpartitioned original.
    "scan_partition_prune" -> Q(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |       COUNT(DISTINCT o_custkey) AS n_cust,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val dir = stage(d, "hivepart")
      T.orders(s, d).select("o_custkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
      s.read.parquet(dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          countDistinct("o_custkey").as("n_cust"),
          dec2(sum(dec2(col("o_totalprice")))).as("sum_price"))
    },

    // XML parsing (from_xml, new in Spark 4): synthesize a per-order XML
    // document from typed columns, parse it back with an explicit
    // schema, emit the parsed fields. The oracle emits the same fields
    // straight from parquet — the gate asserts parse∘render = id.
    "fn_xml" -> Q(
      """SELECT o_orderkey, o_orderpriority AS prio,
        |       CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      T.orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          concat(lit("<o><k>"), col("o_orderkey"),
            lit("</k><p>"), col("o_orderpriority"),
            lit("</p><t>"), dec2(col("o_totalprice")),
            lit("</t></o>")).as("xml"))
        .select(col("o_orderkey"),
          expr("from_xml(xml, 'k BIGINT, p STRING, t DECIMAL(18,2)')").as("px"))
        .select(col("o_orderkey"), col("px.p").as("prio"), col("px.t").as("price"))
        .orderBy("o_orderkey")
    }
  )
}
