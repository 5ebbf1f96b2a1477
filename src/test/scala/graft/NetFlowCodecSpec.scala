package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.NetFlowCodec
import graft.streaming.NetFlowCodec._

/** Golden decode tests for the FIXTURES.md §3 cases. Fixtures are built
  * by a deterministic in-test generator (wire layouts per RFC 3954 /
  * RFC 7011 and the classic v5 fixed format).
  */
class NetFlowCodecSpec extends AnyFunSuite {

  private val exporter = "10.0.0.1"
  private val recvUs = 1700000000000000L // 2023-11-14T22:13:20Z in µs

  private def noTemplates = Map.empty[TemplateKey, Template]

  // ---------------------------------------------------------- builders
  private def v5Packet(records: Seq[(String, String, Int, Int, Int, Long, Long)],
      sysUptime: Long = 60000L, unixSecs: Long = 1700000000L): Array[Byte] = {
    val buf = ByteBuffer.allocate(24 + 48 * records.size).order(ByteOrder.BIG_ENDIAN)
    buf.putShort(5).putShort(records.size.toShort)
      .putInt(sysUptime.toInt).putInt(unixSecs.toInt).putInt(0)
      .putInt(7).put(1.toByte).put(2.toByte).putShort(0)
    records.foreach { case (src, dst, sp, dp, proto, pkts, bytes) =>
      buf.putInt(ip(src)).putInt(ip(dst)).putInt(ip("192.0.2.254"))
        .putShort(3).putShort(4)                         // in/out if
        .putInt(pkts.toInt).putInt(bytes.toInt)
        .putInt(30000).putInt(45000)                     // first/last uptime ms
        .putShort(sp.toShort).putShort(dp.toShort)
        .put(0.toByte).put(0x1b.toByte).put(proto.toByte).put(0.toByte)
        .putShort(64512.toShort).putShort(64513.toShort) // src/dst AS
        .put(24.toByte).put(24.toByte).putShort(0)
    }
    buf.array()
  }

  private def ip(s: String): Int =
    s.split('.').foldLeft(0)((acc, o) => (acc << 8) | o.toInt)

  /** IPFIX template set for template `id` with (ieId, len) fields. */
  private def ipfixTemplate(id: Int, fields: Seq[(Int, Int)]): Array[Byte] = {
    val body = ByteBuffer.allocate(8 + fields.size * 4).order(ByteOrder.BIG_ENDIAN)
    body.putShort(2).putShort((8 + fields.size * 4).toShort)
    body.putShort(id.toShort).putShort(fields.size.toShort)
    fields.foreach { case (ie, len) => body.putShort(ie.toShort).putShort(len.toShort) }
    body.array()
  }

  private def ipfixPacket(domain: Long, sets: Array[Byte]*): Array[Byte] = {
    val total = 16 + sets.map(_.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    buf.putShort(10).putShort(total.toShort).putInt(1700000100)
      .putInt(42).putInt(domain.toInt)
    sets.foreach(buf.put)
    buf.array()
  }

  private val stdFields = Seq(
    (8, 4), (12, 4),     // src/dst v4
    (7, 2), (11, 2),     // src/dst port
    (4, 1),              // protocol
    (1, 8), (2, 8),      // octets, packets
    (152, 8), (153, 8))  // start/end ms

  private def stdDataRecord(src: String, dst: String, sp: Int, dp: Int, proto: Int,
      bytes: Long, pkts: Long, startMs: Long, endMs: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + 4 + 2 + 2 + 1 + 8 + 8 + 8 + 8).order(ByteOrder.BIG_ENDIAN)
    b.putInt(ip(src)).putInt(ip(dst)).putShort(sp.toShort).putShort(dp.toShort)
      .put(proto.toByte).putLong(bytes).putLong(pkts).putLong(startMs).putLong(endMs)
    b.array()
  }

  private def dataSet(templateId: Int, payload: Array[Byte], pad: Int = 0): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + payload.length + pad).order(ByteOrder.BIG_ENDIAN)
    buf.putShort(templateId.toShort).putShort((4 + payload.length + pad).toShort).put(payload)
    buf.array()
  }

  // ------------------------------------------------------------- tests
  test("v5: single packet, two records, hand-computed goldens") {
    val pkt = v5Packet(Seq(
      ("192.0.2.1", "198.51.100.2", 1234, 80, 6, 10L, 5000L),
      ("192.0.2.3", "198.51.100.4", 4321, 443, 17, 2L, 300L)))
    val res = NetFlowCodec.decode(exporter, recvUs, pkt, noTemplates)
    assert(res.errors.isEmpty)
    assert(res.records.size == 2)
    val r = res.records.head
    assert(r.src_addr == "192.0.2.1" && r.dst_addr == "198.51.100.2")
    assert(r.src_port == 1234 && r.dst_port == 80 && r.protocol == 6)
    assert(r.packets == 10L && r.bytes == 5000L)
    assert(r.tcp_flags == 0x1b && r.src_as == 64512L && r.dst_as == 64513L)
    assert(r.in_if == 3 && r.out_if == 4 && r.next_hop == "192.0.2.254")
    // boot = unixSecs*1000 - sysUptime = 1700000000000 - 60000;
    // start = boot + 30000, end = boot + 45000
    assert(r.start_ts.getTime == 1700000000000L - 60000L + 30000L)
    assert(r.end_ts.getTime == 1700000000000L - 60000L + 45000L)
    assert(r.duration_ms == 15000L)
    assert(res.templates.isEmpty) // v5 is stateless
  }

  test("ipfix: template then data decodes 3 records") {
    val data = Array(
      stdDataRecord("10.1.1.1", "10.2.2.2", 1111, 53, 17, 400L, 2L, 1700000000000L, 1700000001000L),
      stdDataRecord("10.1.1.2", "10.2.2.3", 2222, 80, 6, 9000L, 12L, 1700000002000L, 1700000005000L),
      stdDataRecord("10.1.1.3", "10.2.2.4", 3333, 22, 6, 100L, 1L, 1700000003000L, 1700000003000L)
    ).flatten
    val pkt = ipfixPacket(7L, ipfixTemplate(256, stdFields), dataSet(256, data))
    val res = NetFlowCodec.decode(exporter, recvUs, pkt, noTemplates)
    assert(res.errors.isEmpty)
    assert(res.records.size == 3)
    assert(res.templates.contains(TemplateKey(exporter, 7L, 256)))
    val r = res.records(1)
    assert(r.src_addr == "10.1.1.2" && r.dst_port == 80 && r.protocol == 6)
    assert(r.bytes == 9000L && r.packets == 12L)
    assert(r.start_ts.getTime == 1700000002000L && r.duration_ms == 3000L)
    assert(r.domain == 7L)
  }

  test("ipfix: data before template is dropped; later template unlocks") {
    val data = stdDataRecord("10.1.1.1", "10.2.2.2", 1, 2, 6, 1L, 1L, 0L, 0L)
    val early = ipfixPacket(7L, dataSet(256, data))
    val res1 = NetFlowCodec.decode(exporter, recvUs, early, noTemplates)
    assert(res1.records.isEmpty)
    assert(res1.errors.exists(_.contains("before template")))
    assert(res1.templates.isEmpty) // state uncorrupted

    val tmpl = ipfixPacket(7L, ipfixTemplate(256, stdFields))
    val res2 = NetFlowCodec.decode(exporter, recvUs, tmpl, res1.templates)
    val late = ipfixPacket(7L, dataSet(256, data))
    val res3 = NetFlowCodec.decode(exporter, recvUs, late, res2.templates)
    assert(res3.records.size == 1 && res3.errors.isEmpty)
  }

  test("ipfix: same template id in two observation domains keeps distinct field lists") {
    // domain 1: standard layout; domain 2: ports only (different length)
    val t1 = ipfixPacket(1L, ipfixTemplate(256, stdFields))
    val t2 = ipfixPacket(2L, ipfixTemplate(256, Seq((7, 2), (11, 2))))
    val afterT1 = NetFlowCodec.decode(exporter, recvUs, t1, noTemplates).templates
    val afterT2 = NetFlowCodec.decode(exporter, recvUs, t2, afterT1).templates
    assert(afterT2.size == 2)
    assert(afterT2(TemplateKey(exporter, 1L, 256)).recordLength == 45)
    assert(afterT2(TemplateKey(exporter, 2L, 256)).recordLength == 4)

    val portsOnly = ByteBuffer.allocate(4).putShort(1234.toShort).putShort(80.toShort).array()
    val d2 = ipfixPacket(2L, dataSet(256, portsOnly))
    val res = NetFlowCodec.decode(exporter, recvUs, d2, afterT2)
    assert(res.records.size == 1)
    assert(res.records.head.src_port == 1234 && res.records.head.dst_port == 80)
    assert(res.records.head.src_addr == null) // absent IE stays null
  }

  test("ipfix: set padding and enterprise IE are skipped into raw, not mis-parsed") {
    // template: src port (2B) + enterprise IE (pen 9999, 4B) + dst port (2B)
    val body = ByteBuffer.allocate(8 + 4 + 8 + 4).order(ByteOrder.BIG_ENDIAN)
    body.putShort(2).putShort((8 + 4 + 8 + 4).toShort)
    body.putShort(300.toShort).putShort(3.toShort)
    body.putShort(7.toShort).putShort(2.toShort)
    body.putShort((0x8000 | 42).toShort).putShort(4.toShort).putInt(9999)
    body.putShort(11.toShort).putShort(2.toShort)
    val rec = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      .putShort(1234.toShort).putInt(0xDEADBEEF).putShort(443.toShort).array()
    val pkt = ipfixPacket(3L, body.array(), dataSet(300, rec, pad = 3))
    val res = NetFlowCodec.decode(exporter, recvUs, pkt, noTemplates)
    assert(res.errors.isEmpty)
    assert(res.records.size == 1) // padding (3B < record len) ignored
    val r = res.records.head
    assert(r.src_port == 1234 && r.dst_port == 443)
    assert(r.raw.toSeq == Seq(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte))
  }

  test("v9: template + uptime-relative timestamps") {
    // v9 header: version, count, sysUptime, unixSecs, seq, sourceId
    val fields = Seq((8, 4), (12, 4), (7, 2), (11, 2), (4, 1), (1, 4), (2, 4), (22, 4), (21, 4))
    val tbody = ByteBuffer.allocate(8 + fields.size * 4).order(ByteOrder.BIG_ENDIAN)
    tbody.putShort(0).putShort((8 + fields.size * 4).toShort) // v9 template set id = 0
    tbody.putShort(260.toShort).putShort(fields.size.toShort)
    fields.foreach { case (ie, len) => tbody.putShort(ie.toShort).putShort(len.toShort) }
    val rec = ByteBuffer.allocate(29).order(ByteOrder.BIG_ENDIAN)
    rec.putInt(ip("172.16.0.1")).putInt(ip("172.16.0.2"))
      .putShort(5000.toShort).putShort(8080.toShort).put(6.toByte)
      .putInt(1500).putInt(3).putInt(10000).putInt(20000) // start/end uptime ms
    val ds = dataSet(260, rec.array())
    val total = 20 + tbody.array().length + ds.length
    val pkt = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    pkt.putShort(9).putShort(2)
      .putInt(50000)        // sysUptime ms
      .putInt(1700000000)   // unixSecs
      .putInt(1).putInt(99) // seq, sourceId
    pkt.put(tbody.array()).put(ds)
    val res = NetFlowCodec.decode(exporter, recvUs, pkt.array(), noTemplates)
    assert(res.errors.isEmpty && res.records.size == 1)
    val r = res.records.head
    assert(r.domain == 99L && r.src_addr == "172.16.0.1")
    // boot = 1700000000000 - 50000; start = boot + 10000
    assert(r.start_ts.getTime == 1700000000000L - 50000L + 10000L)
    assert(r.end_ts.getTime == 1700000000000L - 50000L + 20000L)
    assert(r.bytes == 1500L && r.packets == 3L)
  }

  test("ipfix: variable-length IE (RFC 7011 §7) decodes, short and long form") {
    // template 310: src port (2B) + interfaceName (IE 82, var-len) + dst port (2B)
    val tmpl = ipfixTemplate(310, Seq((7, 2), (82, 0xFFFF), (11, 2)))
    // record 1: short form — 1-byte length prefix (4) + "eth0"
    val r1 = ByteBuffer.allocate(2 + 1 + 4 + 2).order(ByteOrder.BIG_ENDIAN)
      .putShort(1234.toShort).put(4.toByte).put("eth0".getBytes("UTF-8"))
      .putShort(80.toShort).array()
    // record 2: long form — 0xFF then 2-byte length (5) + "wlan1"
    val r2 = ByteBuffer.allocate(2 + 3 + 5 + 2).order(ByteOrder.BIG_ENDIAN)
      .putShort(4321.toShort).put(0xFF.toByte).putShort(5.toShort)
      .put("wlan1".getBytes("UTF-8")).putShort(443.toShort).array()
    val pkt = ipfixPacket(7L, tmpl, dataSet(310, r1 ++ r2))
    val res = NetFlowCodec.decode(exporter, recvUs, pkt, noTemplates)
    assert(res.errors.isEmpty, res.errors)
    assert(res.records.size == 2)
    assert(res.records(0).src_port == 1234 && res.records(0).dst_port == 80)
    assert(new String(res.records(0).raw, "UTF-8") == "eth0")
    assert(res.records(1).src_port == 4321 && res.records(1).dst_port == 443)
    assert(new String(res.records(1).raw, "UTF-8") == "wlan1")
  }

  test("v9: options template surfaces sampling interval") {
    // Options template set (id 1): template 500, scope System(1)/4B,
    // options samplingInterval(34)/4B + samplingAlgorithm(35)/1B.
    val ot = ByteBuffer.allocate(4 + 6 + 4 + 8).order(ByteOrder.BIG_ENDIAN)
    ot.putShort(1).putShort((4 + 6 + 4 + 8).toShort)
    ot.putShort(500.toShort).putShort(4.toShort).putShort(8.toShort) // scopeLen, optLen (bytes)
    ot.putShort(1.toShort).putShort(4.toShort)   // scope: System, 4B
    ot.putShort(34.toShort).putShort(4.toShort)  // samplingInterval
    ot.putShort(35.toShort).putShort(1.toShort)  // samplingAlgorithm
    val odata = ByteBuffer.allocate(9).order(ByteOrder.BIG_ENDIAN)
      .putInt(0).putInt(1000).put(2.toByte).array()
    val ds = dataSet(500, odata)
    val total = 20 + ot.array().length + ds.length
    val pkt = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    pkt.putShort(9).putShort(2).putInt(50000).putInt(1700000000).putInt(1).putInt(99)
    pkt.put(ot.array()).put(ds)
    val res = NetFlowCodec.decode(exporter, recvUs, pkt.array(), noTemplates)
    assert(res.errors.isEmpty, res.errors)
    assert(res.records.isEmpty)
    assert(res.options.size == 1)
    val o = res.options.head
    assert(o.domain == 99L && o.templateId == 500)
    assert(o.samplingInterval.contains(1000L))
    assert(o.values.get(35).contains(2L))
  }

  test("ipfix: options template (scope count form) surfaces sampling interval") {
    // IPFIX options template set (id 3): template 510, total 2 fields,
    // 1 scope — scope exportingProcessId(144)/4B, option
    // samplingPacketInterval(305)/4B.
    val ot = ByteBuffer.allocate(4 + 6 + 8).order(ByteOrder.BIG_ENDIAN)
    ot.putShort(3).putShort((4 + 6 + 8).toShort)
    ot.putShort(510.toShort).putShort(2.toShort).putShort(1.toShort)
    ot.putShort(144.toShort).putShort(4.toShort)
    ot.putShort(305.toShort).putShort(4.toShort)
    val odata = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      .putInt(77).putInt(4096).array()
    val pkt = ipfixPacket(7L, ot.array(), dataSet(510, odata))
    val res = NetFlowCodec.decode(exporter, recvUs, pkt, noTemplates)
    assert(res.errors.isEmpty, res.errors)
    assert(res.options.size == 1)
    val o = res.options.head
    assert(o.scope.get(144).contains(77L))
    assert(o.samplingInterval.contains(4096L))
  }

  test("ipfix: undersized address IE lands in raw, never overreads") {
    // Hostile template: IE 8 (src v4) declared 2 bytes, as the LAST field
    // of the last record in the packet — a fixed-width getInt would read
    // past the packet end.
    val tmpl = ipfixTemplate(320, Seq((7, 2), (8, 2)))
    val rec = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      .putShort(9999.toShort).putShort(0x0A0B.toShort).array()
    val pkt = ipfixPacket(7L, tmpl, dataSet(320, rec))
    val res = NetFlowCodec.decode(exporter, recvUs, pkt, noTemplates)
    assert(res.errors.isEmpty, res.errors)
    assert(res.records.size == 1)
    val r = res.records.head
    assert(r.src_port == 9999)
    assert(r.src_addr == null) // typed parse refused at wrong width
    assert(r.raw.toSeq == Seq(0x0A.toByte, 0x0B.toByte))
  }

  test("decoder throughput: fixed-template stream sustains collector rates") {
    // 2,000 packets × 30 records on the zero-allocation fixed-template
    // stride path. The assertion is deliberately conservative (50k
    // records/s — real rates are orders of magnitude higher) so CI noise
    // can't flake it; the point is catching an accidental O(n²) or
    // per-record allocation regression on the hot path.
    val recs = (0 until 30).flatMap(i => stdDataRecord(
      s"10.1.${i % 256}.1", "10.2.2.2", 1000 + i, 53, 17,
      400L + i, 2L, 1700000000000L, 1700000001000L)).toArray
    val tmplPkt = ipfixPacket(7L, ipfixTemplate(256, stdFields))
    val dataPkt = ipfixPacket(7L, dataSet(256, recs))
    val templates = NetFlowCodec.decode(exporter, recvUs, tmplPkt, noTemplates).templates
    // warm-up (JIT)
    (0 until 200).foreach(_ => NetFlowCodec.decode(exporter, recvUs, dataPkt, templates))
    val t0 = System.nanoTime()
    var n = 0L
    var i = 0
    while (i < 2000) {
      n += NetFlowCodec.decode(exporter, recvUs, dataPkt, templates).records.size
      i += 1
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 60000L)
    val rate = n / secs
    info(f"decode rate: $rate%.0f records/s")
    assert(rate > 50000.0, f"decode rate collapsed: $rate%.0f records/s")
  }

  test("garbage and short packets produce errors, never throw") {
    assert(NetFlowCodec.decode(exporter, recvUs, Array[Byte](1), noTemplates)
      .errors.nonEmpty)
    assert(NetFlowCodec.decode(exporter, recvUs, Array[Byte](0, 99, 1, 2, 3), noTemplates)
      .errors.exists(_.contains("unsupported version")))
    val truncated = v5Packet(Seq(("1.2.3.4", "5.6.7.8", 1, 2, 6, 1L, 1L))).take(40)
    assert(NetFlowCodec.decode(exporter, recvUs, truncated, noTemplates)
      .errors.exists(_.contains("truncated")))
  }
}
