package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}
import java.sql.Timestamp

/** Pure NetFlow v5 / v9 / IPFIX packet decoder.
  *
  * Wire formats are public: NetFlow v9 per RFC 3954, IPFIX per RFC 7011,
  * IE ids per the IANA IPFIX registry, v5 per the classic fixed layout.
  * (The reference checkout is a tombstone — no code to cite; SURVEY §0.)
  *
  * Design (SURVEY §2.1): decoding is a pure function
  * `(templates, packet) → (templates', records, errors)` — all template
  * state is an immutable map keyed by (exporter, domain, templateId), so
  * the streaming source can thread it through micro-batches and tests can
  * replay any interleaving deterministically. Template-described data
  * seen *before* its template is dropped with an error record (policy:
  * drop-not-buffer, matching common collector practice); a later template
  * unlocks subsequent data sets.
  */
object NetFlowCodec {

  final case class TemplateKey(exporter: String, domain: Long, templateId: Int)
  final case class TemplateField(ieId: Int, length: Int, enterprise: Option[Long] = None)
  final case class Template(fields: Seq[TemplateField]) {
    /** Fixed record length; variable-length fields (len 65535) unsupported → -1. */
    val recordLength: Int =
      if (fields.exists(_.length == 0xFFFF)) -1 else fields.map(_.length).sum
  }

  final case class DecodeResult(
      templates: Map[TemplateKey, Template],
      records: Seq[FlowRecord],
      errors: Seq[String])

  // IANA IPFIX information elements we normalize (others land in `raw`).
  private val IE_OCTETS = 1
  private val IE_PACKETS = 2
  private val IE_PROTOCOL = 4
  private val IE_TOS = 5
  private val IE_TCP_FLAGS = 6
  private val IE_SRC_PORT = 7
  private val IE_SRC_V4 = 8
  private val IE_IN_IF = 10
  private val IE_DST_PORT = 11
  private val IE_DST_V4 = 12
  private val IE_OUT_IF = 14
  private val IE_NEXT_HOP_V4 = 15
  private val IE_SRC_AS = 16
  private val IE_DST_AS = 17
  private val IE_END_UPTIME = 21
  private val IE_START_UPTIME = 22
  private val IE_SRC_V6 = 27
  private val IE_DST_V6 = 28
  private val IE_START_SEC = 150
  private val IE_END_SEC = 151
  private val IE_START_MS = 152
  private val IE_END_MS = 153

  /** Decode one datagram. Dispatches on the 2-byte version field. */
  def decode(exporter: String, recvTsMicros: Long, payload: Array[Byte],
      templates: Map[TemplateKey, Template]): DecodeResult = {
    if (payload.length < 2)
      return DecodeResult(templates, Nil, Seq(s"$exporter: short packet (${payload.length}B)"))
    val version = ((payload(0) & 0xFF) << 8) | (payload(1) & 0xFF)
    version match {
      case 5  => decodeV5(exporter, recvTsMicros, payload, templates)
      case 9  => decodeTemplated(exporter, recvTsMicros, payload, templates, v9 = true)
      case 10 => decodeTemplated(exporter, recvTsMicros, payload, templates, v9 = false)
      case v  => DecodeResult(templates, Nil, Seq(s"$exporter: unsupported version $v"))
    }
  }

  // ------------------------------------------------------------- NetFlow v5
  private val V5_HEADER = 24
  private val V5_RECORD = 48

  private def decodeV5(exporter: String, recvTsMicros: Long, p: Array[Byte],
      templates: Map[TemplateKey, Template]): DecodeResult = {
    if (p.length < V5_HEADER)
      return DecodeResult(templates, Nil, Seq(s"$exporter: v5 short header"))
    val buf = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    val count = buf.getShort(2) & 0xFFFF
    val sysUptime = buf.getInt(4) & 0xFFFFFFFFL       // ms since boot
    val unixSecs = buf.getInt(8) & 0xFFFFFFFFL
    val unixNsecs = buf.getInt(12) & 0xFFFFFFFFL
    val bootMs = unixSecs * 1000L + unixNsecs / 1000000L - sysUptime
    if (p.length < V5_HEADER + count * V5_RECORD)
      return DecodeResult(templates, Nil, Seq(s"$exporter: v5 truncated ($count records)"))
    val records = (0 until count).map { i =>
      val o = V5_HEADER + i * V5_RECORD
      val firstMs = bootMs + (buf.getInt(o + 24) & 0xFFFFFFFFL)
      val lastMs = bootMs + (buf.getInt(o + 28) & 0xFFFFFFFFL)
      FlowRecord(
        recv_ts = microsTs(recvTsMicros),
        exporter = exporter,
        domain = (buf.get(20) & 0xFF).toLong << 8 | (buf.get(21) & 0xFF), // engineType/engineID
        start_ts = new Timestamp(firstMs),
        end_ts = new Timestamp(lastMs),
        duration_ms = lastMs - firstMs,
        src_addr = ipv4(buf.getInt(o)),
        dst_addr = ipv4(buf.getInt(o + 4)),
        src_port = buf.getShort(o + 32) & 0xFFFF,
        dst_port = buf.getShort(o + 34) & 0xFFFF,
        protocol = buf.get(o + 38) & 0xFF,
        tcp_flags = buf.get(o + 37) & 0xFF,
        packets = buf.getInt(o + 16) & 0xFFFFFFFFL,
        bytes = buf.getInt(o + 20) & 0xFFFFFFFFL,
        in_if = buf.getShort(o + 12) & 0xFFFF,
        out_if = buf.getShort(o + 14) & 0xFFFF,
        src_as = (buf.getShort(o + 40) & 0xFFFF).toLong,
        dst_as = (buf.getShort(o + 42) & 0xFFFF).toLong,
        next_hop = ipv4(buf.getInt(o + 8)),
        tos = buf.get(o + 39) & 0xFF,
        raw = Array.emptyByteArray)
    }
    DecodeResult(templates, records, Nil)
  }

  // ------------------------------------------- NetFlow v9 / IPFIX (templated)
  private def decodeTemplated(exporter: String, recvTsMicros: Long, p: Array[Byte],
      tmpl0: Map[TemplateKey, Template], v9: Boolean): DecodeResult = {
    val buf = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    val headerLen = if (v9) 20 else 16
    if (p.length < headerLen)
      return DecodeResult(tmpl0, Nil, Seq(s"$exporter: short header"))
    // v9: sysUptime(ms)@4, unixSecs@8, seq@12, sourceId@16
    // IPFIX: length@2, exportTime(s)@4, seq@8, domain@12
    val sysUptime = if (v9) buf.getInt(4) & 0xFFFFFFFFL else 0L
    val exportSecs = if (v9) buf.getInt(8) & 0xFFFFFFFFL else buf.getInt(4) & 0xFFFFFFFFL
    val domain = if (v9) buf.getInt(16) & 0xFFFFFFFFL else buf.getInt(12) & 0xFFFFFFFFL
    val bootMs = exportSecs * 1000L - sysUptime
    val end = if (v9) p.length else math.min(p.length, buf.getShort(2) & 0xFFFF)
    val templateSetId = if (v9) 0 else 2
    val optionsSetId = if (v9) 1 else 3

    var pos = headerLen
    var templates = tmpl0
    val records = Seq.newBuilder[FlowRecord]
    val errors = Seq.newBuilder[String]

    while (pos + 4 <= end) {
      val setId = buf.getShort(pos) & 0xFFFF
      val setLen = buf.getShort(pos + 2) & 0xFFFF
      if (setLen < 4 || pos + setLen > end) {
        errors += s"$exporter: bad set length $setLen at $pos"
        pos = end // abort packet
      } else {
        val setEnd = pos + setLen
        if (setId == templateSetId) {
          var tp = pos + 4
          // A template set may hold several templates; trailing padding < 4B.
          while (tp + 4 <= setEnd) {
            val templateId = buf.getShort(tp) & 0xFFFF
            val fieldCount = buf.getShort(tp + 2) & 0xFFFF
            tp += 4
            val fields = Seq.newBuilder[TemplateField]
            var ok = true
            var i = 0
            while (i < fieldCount && ok) {
              if (tp + 4 > setEnd) { ok = false }
              else {
                val rawIe = buf.getShort(tp) & 0xFFFF
                val len = buf.getShort(tp + 2) & 0xFFFF
                tp += 4
                if (!v9 && (rawIe & 0x8000) != 0) { // enterprise IE (IPFIX only)
                  if (tp + 4 > setEnd) ok = false
                  else {
                    val pen = buf.getInt(tp) & 0xFFFFFFFFL
                    tp += 4
                    fields += TemplateField(rawIe & 0x7FFF, len, Some(pen))
                  }
                } else fields += TemplateField(rawIe, len)
                i += 1
              }
            }
            if (ok && fieldCount > 0)
              templates = templates.updated(
                TemplateKey(exporter, domain, templateId), Template(fields.result()))
            else if (!ok) errors += s"$exporter: truncated template $templateId"
          }
        } else if (setId == optionsSetId) {
          // Options templates describe metadata streams — skipped (raw).
        } else if (setId >= 256) {
          templates.get(TemplateKey(exporter, domain, setId)) match {
            case None =>
              errors += s"$exporter: data set $setId before template (dropped)"
            case Some(t) if t.recordLength <= 0 =>
              errors += s"$exporter: template $setId has variable-length fields (unsupported)"
            case Some(t) =>
              var rp = pos + 4
              while (rp + t.recordLength <= setEnd) { // trailing padding ignored
                records += decodeDataRecord(exporter, recvTsMicros, domain, buf, rp, t,
                  bootMs, exportSecs, v9)
                rp += t.recordLength
              }
          }
        }
        pos = setEnd
      }
    }
    DecodeResult(templates, records.result(), errors.result())
  }

  private def decodeDataRecord(exporter: String, recvTsMicros: Long, domain: Long,
      buf: ByteBuffer, start: Int, t: Template, bootMs: Long, exportSecs: Long,
      v9: Boolean): FlowRecord = {
    var srcAddr: String = null
    var dstAddr: String = null
    var nextHop: String = null
    var srcPort, dstPort, protocol, tcpFlags, inIf, outIf, tos = 0
    var packets, bytes, srcAs, dstAs = 0L
    var startMs, endMs = 0L
    val rawOut = Array.newBuilder[Byte]

    var off = start
    t.fields.foreach { f =>
      def uint(): Long = { // big-endian unsigned of f.length bytes (≤8)
        var v = 0L
        var i = 0
        while (i < f.length && i < 8) { v = (v << 8) | (buf.get(off + i) & 0xFF); i += 1 }
        v
      }
      if (f.enterprise.isDefined) {
        var i = 0
        while (i < f.length) { rawOut += buf.get(off + i); i += 1 } // keep, don't mis-parse
      } else f.ieId match {
        case IE_OCTETS     => bytes = uint()
        case IE_PACKETS    => packets = uint()
        case IE_PROTOCOL   => protocol = uint().toInt
        case IE_TOS        => tos = uint().toInt
        case IE_TCP_FLAGS  => tcpFlags = uint().toInt
        case IE_SRC_PORT   => srcPort = uint().toInt
        case IE_SRC_V4     => srcAddr = ipv4(buf.getInt(off))
        case IE_IN_IF      => inIf = uint().toInt
        case IE_DST_PORT   => dstPort = uint().toInt
        case IE_DST_V4     => dstAddr = ipv4(buf.getInt(off))
        case IE_OUT_IF     => outIf = uint().toInt
        case IE_NEXT_HOP_V4 => nextHop = ipv4(buf.getInt(off))
        case IE_SRC_AS     => srcAs = uint()
        case IE_DST_AS     => dstAs = uint()
        case IE_START_MS   => startMs = uint()
        case IE_END_MS     => endMs = uint()
        case IE_START_SEC  => startMs = uint() * 1000L
        case IE_END_SEC    => endMs = uint() * 1000L
        case IE_START_UPTIME => startMs = bootMs + uint() // v9 uptime-relative
        case IE_END_UPTIME => endMs = bootMs + uint()
        case IE_SRC_V6     => srcAddr = ipv6(buf, off)
        case IE_DST_V6     => dstAddr = ipv6(buf, off)
        case _ =>
          var i = 0
          while (i < f.length) { rawOut += buf.get(off + i); i += 1 }
      }
      off += f.length
    }
    if (startMs == 0L) startMs = exportSecs * 1000L
    if (endMs == 0L) endMs = startMs
    FlowRecord(
      recv_ts = microsTs(recvTsMicros), exporter = exporter, domain = domain,
      start_ts = new Timestamp(startMs), end_ts = new Timestamp(endMs),
      duration_ms = endMs - startMs,
      src_addr = srcAddr, dst_addr = dstAddr,
      src_port = srcPort, dst_port = dstPort, protocol = protocol,
      tcp_flags = tcpFlags, packets = packets, bytes = bytes,
      in_if = inIf, out_if = outIf, src_as = srcAs, dst_as = dstAs,
      next_hop = nextHop, tos = tos, raw = rawOut.result())
  }

  private def microsTs(us: Long): Timestamp = {
    val ts = new Timestamp(us / 1000L)
    ts.setNanos(((us % 1000000L) * 1000L).toInt)
    ts
  }

  private def ipv4(raw: Int): String =
    s"${(raw >> 24) & 0xFF}.${(raw >> 16) & 0xFF}.${(raw >> 8) & 0xFF}.${raw & 0xFF}"

  private def ipv6(buf: ByteBuffer, off: Int): String =
    (0 until 8).map(i => f"${buf.getShort(off + i * 2) & 0xFFFF}%x").mkString(":")
}
