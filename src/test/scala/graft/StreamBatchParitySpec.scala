package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Proof that the declared (batch) event-time queries are the same plans
  * the engine runs under `readStream` (SURVEY §2.9): run each windowed
  * aggregation as a real streaming query over `events.parquet` and
  * compare against the declared batch result row-for-row.
  */
class StreamBatchParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  /** The file stream source wants a directory of files — stage the events
    * parquet into one.
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  /** events as an unbounded source: same files, readStream, ts_us added. */
  private def eventStream(): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.events(spark, sf).drop("ts_us").schema
    spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
  }

  private def runToCompletion(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("tumbling window agg: readStream result == declared batch result") {
    val stream = eventStream()
      .groupBy(window(col("ts_us"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), Q.dec2(sum(Q.dec2(col("value")))).as("sumv"))
      .select(unix_timestamp(col("window.start")).as("day_s"),
        col("event_type"), col("n"), col("sumv"))
    // Same emission contract as the declared query: decimal internals,
    // DOUBLE at the edge (the cast is streaming-safe — plain projection).
    runToCompletion(SparkEntry.emitDoubles(stream), "sb_tumbling", OutputMode.Complete())
    val got = sortedRows(spark.sql("SELECT * FROM sb_tumbling"))
    val want = sortedRows(SparkEntry.queries("stream_tumbling")(spark, sf))
    assert(got == want)
  }

  test("session window agg: readStream result == declared batch result") {
    val stream = eventStream()
      .groupBy(session_window(col("ts_us"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("ts_us")).as("last_ts"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_s"),
        unix_timestamp(col("last_ts")).as("end_s"),
        col("n"))
    runToCompletion(stream, "sb_session", OutputMode.Complete())
    val got = sortedRows(spark.sql("SELECT * FROM sb_session"))
    val want = sortedRows(SparkEntry.queries("stream_session")(spark, sf))
    assert(got == want)
  }

  test("sliding window agg: readStream result == declared batch result") {
    val stream = eventStream()
      .groupBy(window(col("ts_us"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), Q.dec2(sum(Q.dec2(col("value")))).as("sumv"))
      .select(unix_timestamp(col("window.start")).as("win_s"),
        col("event_type"), col("n"), col("sumv"))
    runToCompletion(SparkEntry.emitDoubles(stream), "sb_sliding", OutputMode.Complete())
    val got = sortedRows(spark.sql("SELECT * FROM sb_sliding"))
    val want = sortedRows(SparkEntry.queries("stream_sliding")(spark, sf))
    assert(got == want)
  }
}
