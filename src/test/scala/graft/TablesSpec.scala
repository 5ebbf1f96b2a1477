package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Loader canonicalization guards. The round-8 regression: a driver data
  * refresh switched `events.ts` from ns-INT64 to µs-TIMESTAMP_NTZ and the
  * then-unconditional `ts div 1000` failed analysis, erroring all 22
  * events-table queries. `Tables.normalizeEvents` must present the ONE
  * canonical shape (`ts` BIGINT epoch-ns + `ts_us` TIMESTAMP) under
  * either physical encoding — pinned here on synthetic frames of both
  * encodings carrying the same instants, plus the real fixture.
  */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // Whole-µs instants (ns multiples of 1000): the µs encoding cannot
  // carry sub-µs payload, so equivalence is defined on this domain.
  private val instantsNs = Seq(
    1704067200000000000L, // 2024-01-01T00:00:00Z
    1704070800123456000L, // +1h, fractional µs payload
    1706738232194062000L) // near the fixture max

  test("both events.ts encodings normalize to the same (ts ns, ts_us) rows") {
    import spark.implicits._
    val nsDf = instantsNs.toDF("ts")
    val usDf = instantsNs.map(_ / 1000).toDF("us")
      .select(expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"))
    val a = Tables.normalizeEvents(nsDf)
    val b = Tables.normalizeEvents(usDf)
    for (df <- Seq(a, b)) {
      assert(df.schema("ts").dataType == LongType, df.schema.treeString)
      assert(df.schema("ts_us").dataType == TimestampType, df.schema.treeString)
    }
    val rowsA = a.select("ts", "ts_us").collect().map(_.toString).sorted.toSeq
    val rowsB = b.select("ts", "ts_us").collect().map(_.toString).sorted.toSeq
    assert(rowsA == rowsB)
    // And the ns BIGINT is the true epoch value, not a re-zoned one.
    assert(rowsA.head.contains(instantsNs.min.toString))
  }

  test("the shipped events fixture loads to the canonical schema") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == LongType, ev.schema.treeString)
    assert(ev.schema("ts_us").dataType == TimestampType, ev.schema.treeString)
    // ts and ts_us agree: rebuilding µs from the ns BIGINT matches ts_us
    // on every row (0 mismatches) — whichever encoding the fixture ships.
    val bad = ev.filter(
      expr("timestamp_micros(ts div 1000)") =!= col("ts_us")).count()
    assert(bad == 0L)
  }
}
