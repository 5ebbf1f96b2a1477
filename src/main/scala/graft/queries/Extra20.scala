package graft.queries

import java.util.concurrent.ConcurrentHashMap

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Round-10 additions, part 10: dirty-data ingest. At 100 TB the
  * question is never IF the raw feed contains malformed records, only
  * how the scan degrades: PERMISSIVE parsing quarantines bad rows into
  * a corrupt-record column in the same single pass that parses the good
  * ones — no second scan, no job failure, and the bad rows stay
  * addressable for a quarantine sink instead of vanishing (DROPMALFORMED)
  * or killing the job (FAILFAST).
  */
object Extra20 {

  private val staged = new ConcurrentHashMap[String, java.lang.Boolean]()

  val defs: Map[String, Q] = Map(

    // MALFORMED-RECORD CSV SCAN — a deterministically dirtied feed
    // (every 13th record's numeric field is garbage) read with an
    // explicit schema + PERMISSIVE mode + columnNameOfCorruptRecord.
    // The single aggregate references BOTH data and corrupt columns on
    // purpose: Spark disallows queries projecting ONLY the internal
    // corrupt column (the parser would have pruned the raw line it
    // needs), and the one-pass good/bad/quarantine rollup is also
    // exactly the shape a production ingest gate wants — one scan,
    // map-side partials, a 1-row result. The oracle replays the
    // generator formulas from the clean table (the scan_binaryfile
    // precedent): 'bad' is defined by construction, so DuckDB states
    // the expected good/bad counts and good-row sums independently of
    // Spark's parser.
    "scan_csv_malformed" -> Q(
      """SELECT
        |  CAST(count(*) FILTER (o_orderkey % 13 <> 0) AS BIGINT) AS n_good,
        |  CAST(count(*) FILTER (o_orderkey % 13 = 0) AS BIGINT) AS n_bad,
        |  CAST(sum(o_custkey) FILTER (o_orderkey % 13 <> 0) AS BIGINT) AS sum_ck,
        |  CAST(count(DISTINCT o_orderpriority) FILTER (o_orderkey % 13 <> 0) AS BIGINT) AS n_prio
        |FROM read_parquet('{sfDir}/orders.parquet')""".stripMargin) { (s, d) =>
      val dir = Q.stageDir("graft_dirty", d,
        "csv_" + Q.corpusFingerprint(s, s"$d/orders.parquet"))
      staged.computeIfAbsent(dir, { _ =>
        // one CSV line per order; every 13th gets an unparseable
        // custkey — written as plain text so the dirt survives exactly
        // as authored (the csv writer would quote/escape it away)
        T.orders(s, d).select(concat_ws(",",
            col("o_orderkey"),
            // the otherwise-branch is cast explicitly: ANSI CASE coercion
            // resolves STRING vs BIGINT to BIGINT and then fails casting
            // the dirt at runtime
            when(col("o_orderkey") % 13 === 0,
              concat(lit("bad_"), col("o_orderkey")))
              .otherwise(col("o_custkey").cast("string")),
            col("o_orderpriority")).as("value"))
          .write.mode("overwrite").text(dir)
        java.lang.Boolean.TRUE
      })
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("ck", LongType),
        StructField("prio", StringType),
        StructField("_corrupt_record", StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dir)
        .agg(
          sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_bad"),
          sum(when(col("_corrupt_record").isNull, col("ck"))).as("sum_ck"),
          countDistinct(when(col("_corrupt_record").isNull, col("prio"))).as("n_prio"))
    }
  )
}
