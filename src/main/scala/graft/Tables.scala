package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (schemas in FIXTURES.md §1). Keep reads bare (`spark.read.parquet`)
  * so Catalyst's column pruning / predicate pushdown reach the scan.
  */
object Tables {
  // Plausible event-timestamp band in EPOCH NANOSECONDS:
  // 2000-01-01T00:00Z and 2100-01-01T00:00Z (946684800 / 4102444800 s).
  // Used by normalizeEvents' LongType magnitude guard.
  private[graft] val NS_EPOCH_LO = 946684800000000000L
  private[graft] val NS_EPOCH_HI = 4102444800000000000L

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    s.read.parquet(s"$d/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.ts` has shipped in two physical encodings across data
    * refreshes: ns-precision INT64 (Spark 4.1.2 reads it only with
    * `nanosAsLong`, as BIGINT nanoseconds) and plain TIMESTAMP(µs)
    * (isAdjustedToUTC=false → TIMESTAMP_NTZ). Downstream queries rely on
    * ONE canonical schema — `ts: BIGINT` epoch-nanoseconds plus
    * `ts_us: TimestampType` — so normalize here, per encoding:
    *   - ns-long files: `ts` passes through; `ts_us = timestamp_micros
    *     (ts div 1000)`. Integer `div`, never `/1000` — double division
    *     loses precision at ns-epoch magnitude (SURVEY §2.11).
    *   - µs-timestamp files: `ts_us = cast(ts as timestamp)` (session TZ
    *     is pinned UTC, so the NTZ→TZ cast is value-preserving) and
    *     `ts = unix_micros(ts_us) * 1000` rebuilds the ns BIGINT exactly
    *     (µs payload ⇒ ×1000 is lossless and stays < 2^63).
    * A third plausible refresh encoding — adjusted-to-UTC µs, read as
    * TimestampType (LTZ) — flows through the same generic branch, where
    * the cast is the identity (TablesSpec pins all three encodings to
    * identical canonical rows). The last aliasing class — a RAW int64
    * in non-ns units (ms/µs/s epoch without a parquet timestamp
    * annotation), which the LongType branch would otherwise misread as
    * ns — is closed structurally since r12 by the per-row ns-epoch
    * magnitude guard in that branch (any sub-2000/post-2100 value
    * raises the named encoding error; ms/µs/s epochs for real event
    * years are 3–9 orders of magnitude below the band). The
    * fixture-agreement pin in TablesSpec (ts vs ts_us on the shipped
    * file) remains as a second, independent tripwire.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The µs-branch's NTZ→TZ cast is value-preserving ONLY under a UTC
    // session zone; every harness entry point pins UTC already, but the
    // invariant belongs to the function that depends on it (ADVICE r9) —
    // a non-UTC caller would otherwise get silently re-zoned epochs.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeEvents(t(s, d, "events"))
  }

  /** Canonicalize a raw events frame (batch or streaming — pure
    * projections, streaming-safe) to `ts: BIGINT` ns + `ts_us: TIMESTAMP`.
    */
  def normalizeEvents(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Magnitude guard (VERDICT r11 #4): a refresh that ships RAW
        // INT64 in ms/µs/s units aliases into this branch BY TYPE — the
        // whitelist below can't see it. Nanosecond epochs for any
        // plausible event year (2000–2100) sit in [9.47e17, 4.10e18];
        // ms (~1e12), µs (~1e15), and s (~1e9) encodings are 3–9 orders
        // below, so a closed band check per ROW converts the silent
        // unit shift into the same named failure as an unknown type.
        // Pure projection (streaming-safe; min(ts) would be an action),
        // one between() per row inside codegen, nulls pass through
        // unchanged (null-ts is a data question, not an encoding one).
        // Known tradeoff (ADVICE r12): wrapping ts in CaseWhen makes it
        // a DERIVED column for every LongType consumer, so direct ts
        // predicates no longer push to the parquet scan (no row-group
        // pruning on ts), and a legitimate ns epoch outside 2000–2100
        // hard-fails. Accepted: no declared query filters raw ts at the
        // scan today; if one ever regresses on this, validate via a
        // one-time min/max footer check instead of rewriting the column.
        raw
          .withColumn("ts",
            when(col("ts").isNull ||
                col("ts").between(NS_EPOCH_LO, NS_EPOCH_HI), col("ts"))
              .otherwise(raise_error(concat(
                lit("graft.Tables.normalizeEvents: INT64 ts="),
                col("ts").cast("string"),
                lit(s" outside the ns-epoch band [$NS_EPOCH_LO, " +
                  s"$NS_EPOCH_HI] (years 2000-2100). A ms/us/s-encoded " +
                  "refresh must get its own branch + TablesSpec pin, " +
                  "not alias as nanoseconds."))).cast("bigint")))
          .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.TimestampType =>
        // NTZ: the cast UTC-reinterprets under the session zone pinned by
        // Q.session; LTZ: the cast is the identity (LTZ already stores
        // the instant) — both land on the true epoch value (TablesSpec).
        raw
          .withColumn("ts_us", col("ts").cast("timestamp"))
          .withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case other =>
        // Closed whitelist (VERDICT r10 #7): only encodings with a pinned
        // interpretation pass — ns-since-epoch INT64, µs TIMESTAMP_NTZ,
        // and instant-typed TIMESTAMP. Anything else a driver refresh
        // could ship (ms-INT64 would alias into the LONG branch by type
        // alone; INT32 seconds; DOUBLE epoch; ISO-8601 STRING) must fail
        // HERE by name, not downstream as an oracle hash diff with every
        // event silently 1970-adjacent or unit-shifted.
        throw new IllegalArgumentException(
          s"graft.Tables.normalizeEvents: unsupported events.ts encoding " +
            s"$other; expected LongType (ns since epoch), TimestampNTZType " +
            s"(session-local microseconds), or TimestampType. A new driver " +
            s"fixture encoding needs an explicit branch with its own " +
            s"TablesSpec pin, not a silent fallthrough.")
    }
}
