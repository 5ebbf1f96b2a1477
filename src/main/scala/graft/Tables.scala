package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (schemas in FIXTURES.md §1). Keep reads bare (`spark.read.parquet`)
  * so Catalyst's column pruning / predicate pushdown reach the scan.
  */
object Tables {
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

  /** `events.ts` is ns-precision parquet; Spark 4.1.2 throws
    * PARQUET_TYPE_ILLEGAL on it unless `nanosAsLong` is set, after which
    * `ts` arrives as BIGINT nanoseconds. We convert with integer `div`
    * (never `/1000` — double division loses precision at ns-epoch
    * magnitude; SURVEY §2.11). Adds `ts_us: TimestampType`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
  }
}
