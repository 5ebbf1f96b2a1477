package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Canonical normalized flow record (SURVEY §1.2, FIXTURES.md §3).
  *
  * Whatever mix of IEs an exporter sends (NetFlow v5 fixed layout, v9 or
  * IPFIX template-described), the pipeline emits exactly this schema —
  * absent fields null/zero. This mirrors the reference's fixed Parquet
  * output schema (nf2pq = netflow→parquet, /root/reference/README.md:1)
  * while keeping the template-driven dynamic schema confined to the
  * decoder ([R /root/reference/.gitignore:1-8] establishes the upstream
  * as a Cargo/Rust collector; wire formats per RFC 3954 / RFC 7011).
  */
final case class FlowRecord(
    recv_ts: Timestamp,
    exporter: String,
    domain: Long,
    start_ts: Timestamp,
    end_ts: Timestamp,
    duration_ms: Long,
    src_addr: String,
    dst_addr: String,
    src_port: Int,
    dst_port: Int,
    protocol: Int,
    tcp_flags: Int,
    packets: Long,
    bytes: Long,
    in_if: Int,
    out_if: Int,
    src_as: Long,
    dst_as: Long,
    next_hop: String,
    tos: Int,
    raw: Array[Byte])

object FlowSchema {
  /** StructType constant for untyped (DataFrame) paths. */
  val schema: StructType = StructType(Seq(
    StructField("recv_ts", TimestampType),
    StructField("exporter", StringType),
    StructField("domain", LongType),
    StructField("start_ts", TimestampType),
    StructField("end_ts", TimestampType),
    StructField("duration_ms", LongType),
    StructField("src_addr", StringType),
    StructField("dst_addr", StringType),
    StructField("src_port", IntegerType),
    StructField("dst_port", IntegerType),
    StructField("protocol", IntegerType),
    StructField("tcp_flags", IntegerType),
    StructField("packets", LongType),
    StructField("bytes", LongType),
    StructField("in_if", IntegerType),
    StructField("out_if", IntegerType),
    StructField("src_as", LongType),
    StructField("dst_as", LongType),
    StructField("next_hop", StringType),
    StructField("tos", IntegerType),
    StructField("raw", BinaryType)))

  /** Raw packet envelope produced by the UDP source (pre-decode). */
  val packetSchema: StructType = StructType(Seq(
    StructField("recv_ts", TimestampType),
    StructField("peer", StringType),
    StructField("payload", BinaryType)))
}
