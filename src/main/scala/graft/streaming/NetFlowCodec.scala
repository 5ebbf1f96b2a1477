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
  *
  * Variable-length IEs (RFC 7011 §7 — string/URL/name elements) decode
  * via per-record field walks; options templates (scope + option fields)
  * decode into [[OptionsRecord]]s, surfacing per-exporter sampling
  * config for de-sampling counters.
  */
object NetFlowCodec {

  final case class TemplateKey(exporter: String, domain: Long, templateId: Int)
  final case class TemplateField(ieId: Int, length: Int, enterprise: Option[Long] = None)

  /** `isOptions` marks an options template (RFC 3954 §6.2 / RFC 7011
    * §3.4.2.2) whose first `scopeCount` fields are scope — scopeCount
    * may legitimately be 0 (some exporters send scope-less options).
    */
  final case class Template(fields: Seq[TemplateField], scopeCount: Int = 0,
      isOptions: Boolean = false) {
    /** True if any field is RFC 7011 §7 variable-length (len 0xFFFF). */
    val hasVarLen: Boolean = fields.exists(_.length == 0xFFFF)
    /** Fixed record length, or -1 when records must be walked (var-len). */
    val recordLength: Int = if (hasVarLen) -1 else fields.map(_.length).sum
    /** Smallest possible wire size of one record (var-len fields ≥ 1B
      * prefix) — anything shorter at a set tail is padding.
      */
    val minRecordLength: Int =
      fields.map(f => if (f.length == 0xFFFF) 1 else f.length).sum
    /** Per-field start offsets within a FIXED record (empty when var-len)
      * — lets the hot decode path stride with zero per-record allocation.
      */
    val fixedOffsets: Array[Int] =
      if (hasVarLen) Array.emptyIntArray
      else fields.scanLeft(0)(_ + _.length).toArray
  }

  /** One decoded options-data record: metadata an exporter publishes about
    * its own process (RFC 3954 §6.2) — sampling config, exporter stats.
    * Field values are big-endian uints (≤8 B kept; longer values and
    * var-len strings are dropped from the maps — sampling IEs are all
    * fixed ints).
    */
  final case class OptionsRecord(exporter: String, domain: Long, templateId: Int,
      scope: Map[Int, Long], values: Map[Int, Long]) {
    /** Packet-sampling interval ("1 in N"): v9 IE 34 (samplingInterval) or
      * IPFIX IE 305 (samplingPacketInterval). The de-sampling multiplier
      * for byte/packet counters.
      */
    def samplingInterval: Option[Long] = values.get(34).orElse(values.get(305))
  }

  final case class DecodeResult(
      templates: Map[TemplateKey, Template],
      records: Seq[FlowRecord],
      errors: Seq[String],
      options: Seq[OptionsRecord] = Nil)

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

  /** Decode one datagram. Dispatches on the 2-byte version field.
    * Total: a malformed (or hostile) datagram can never throw out of this
    * network-facing entry point and kill the streaming task — any decode
    * exception becomes an error record with the prior template state kept.
    */
  def decode(exporter: String, recvTsMicros: Long, payload: Array[Byte],
      templates: Map[TemplateKey, Template]): DecodeResult = {
    if (payload.length < 2)
      return DecodeResult(templates, Nil, Seq(s"$exporter: short packet (${payload.length}B)"))
    val version = ((payload(0) & 0xFF) << 8) | (payload(1) & 0xFF)
    try version match {
      case 5  => decodeV5(exporter, recvTsMicros, payload, templates)
      case 9  => decodeTemplated(exporter, recvTsMicros, payload, templates, v9 = true)
      case 10 => decodeTemplated(exporter, recvTsMicros, payload, templates, v9 = false)
      case v  => DecodeResult(templates, Nil, Seq(s"$exporter: unsupported version $v"))
    } catch {
      case e: Exception =>
        DecodeResult(templates, Nil,
          Seq(s"$exporter: malformed v$version packet: ${e.getClass.getSimpleName}"))
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
    val opts = Seq.newBuilder[OptionsRecord]

    // Field-spec list shared by data and options templates; returns
    // (fields, nextPos) or null on truncation.
    def readFieldSpecs(tp0: Int, setEnd: Int, n: Int): (Seq[TemplateField], Int) = {
      var tp = tp0
      val fields = Seq.newBuilder[TemplateField]
      var i = 0
      while (i < n) {
        if (tp + 4 > setEnd) return null
        val rawIe = buf.getShort(tp) & 0xFFFF
        val len = buf.getShort(tp + 2) & 0xFFFF
        tp += 4
        if (!v9 && (rawIe & 0x8000) != 0) { // enterprise IE (IPFIX only)
          if (tp + 4 > setEnd) return null
          val pen = buf.getInt(tp) & 0xFFFFFFFFL
          tp += 4
          fields += TemplateField(rawIe & 0x7FFF, len, Some(pen))
        } else fields += TemplateField(rawIe, len)
        i += 1
      }
      (fields.result(), tp)
    }

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
          var cont = true
          while (cont && tp + 4 <= setEnd) {
            val templateId = buf.getShort(tp) & 0xFFFF
            val fieldCount = buf.getShort(tp + 2) & 0xFFFF
            readFieldSpecs(tp + 4, setEnd, fieldCount) match {
              case null =>
                errors += s"$exporter: truncated template $templateId"
                cont = false
              case (fields, next) =>
                if (fieldCount > 0)
                  templates = templates.updated(
                    TemplateKey(exporter, domain, templateId), Template(fields))
                tp = next
            }
          }
        } else if (setId == optionsSetId) {
          // Options templates (RFC 3954 §6.2 v9 / RFC 7011 §3.4.2.2 IPFIX):
          // scope fields first, then option fields; data records decoded
          // into OptionsRecord (sampling config etc.).
          var tp = pos + 4
          var cont = true
          while (cont && tp + 6 <= setEnd) {
            val templateId = buf.getShort(tp) & 0xFFFF
            // v9 carries byte lengths of the two spec regions; IPFIX
            // carries field counts (total + scope).
            val (scopeN, totalN) =
              if (v9) ((buf.getShort(tp + 2) & 0xFFFF) / 4,
                ((buf.getShort(tp + 2) & 0xFFFF) + (buf.getShort(tp + 4) & 0xFFFF)) / 4)
              else (buf.getShort(tp + 4) & 0xFFFF, buf.getShort(tp + 2) & 0xFFFF)
            readFieldSpecs(tp + 6, setEnd, totalN) match {
              case null =>
                errors += s"$exporter: truncated options template $templateId"
                cont = false
              case (fields, next) =>
                if (totalN > 0 && scopeN <= totalN)
                  templates = templates.updated(
                    TemplateKey(exporter, domain, templateId),
                    Template(fields, scopeCount = scopeN, isOptions = true))
                tp = next
            }
          }
        } else if (setId >= 256) {
          templates.get(TemplateKey(exporter, domain, setId)) match {
            case None =>
              errors += s"$exporter: data set $setId before template (dropped)"
            case Some(t) if t.minRecordLength <= 0 =>
              errors += s"$exporter: template $setId has zero-size records (dropped)"
            case Some(t) if !t.hasVarLen =>
              // Fixed-size records: zero-allocation stride by recordLength
              // using the template's precomputed field offsets (the hot
              // collector path). Trailing padding (< one record) ignored.
              var rp = pos + 4
              while (rp + t.recordLength <= setEnd) {
                if (t.isOptions)
                  opts += decodeOptionsRecord(exporter, domain, setId, buf, t, rp, null)
                else
                  records += decodeDataRecord(exporter, recvTsMicros, domain, buf, t,
                    rp, null, bootMs, exportSecs, v9)
                rp += t.recordLength
              }
            case Some(t) =>
              // Var-len records (RFC 7011 §7): walked field-by-field,
              // resolving per-record length prefixes.
              var rp = pos + 4
              var cont = true
              while (cont && rp + t.minRecordLength <= setEnd) {
                val lens = resolveFieldLengths(buf, rp, setEnd, t)
                if (lens == null) {
                  errors += s"$exporter: truncated data record in set $setId"
                  cont = false
                } else {
                  if (t.isOptions)
                    opts += decodeOptionsRecord(exporter, domain, setId, buf, t, rp, lens)
                  else
                    records += decodeDataRecord(exporter, recvTsMicros, domain, buf, t,
                      rp, lens, bootMs, exportSecs, v9)
                  rp = lens.last._1 + lens.last._2 // end of last field
                }
              }
          }
        }
        pos = setEnd
      }
    }
    DecodeResult(templates, records.result(), errors.result(), opts.result())
  }

  /** Per-record (offset, actualLength) for every template field, resolving
    * RFC 7011 §7 var-len prefixes (1 byte, or 0xFF + 2 bytes). Returns
    * null if the record would cross `limit`.
    */
  private def resolveFieldLengths(buf: ByteBuffer, start: Int, limit: Int,
      t: Template): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](t.fields.length)
    var off = start
    var i = 0
    while (i < t.fields.length) {
      val f = t.fields(i)
      var len = f.length
      if (len == 0xFFFF) {
        if (off + 1 > limit) return null
        val b0 = buf.get(off) & 0xFF
        if (b0 < 255) { len = b0; off += 1 }
        else {
          if (off + 3 > limit) return null
          len = buf.getShort(off + 1) & 0xFFFF
          off += 3
        }
      }
      if (off + len > limit) return null
      out(i) = (off, len)
      off += len
      i += 1
    }
    out
  }

  /** `lens` carries per-record (offset, length) pairs for var-len
    * templates; null for fixed templates, where offsets come from the
    * template's precomputed `fixedOffsets` relative to `base` (no
    * per-record allocation).
    */
  private def decodeDataRecord(exporter: String, recvTsMicros: Long, domain: Long,
      buf: ByteBuffer, t: Template, base: Int, lens: Array[(Int, Int)],
      bootMs: Long, exportSecs: Long, v9: Boolean): FlowRecord = {
    var srcAddr: String = null
    var dstAddr: String = null
    var nextHop: String = null
    var srcPort, dstPort, protocol, tcpFlags, inIf, outIf, tos = 0
    var packets, bytes, srcAs, dstAs = 0L
    var startMs, endMs = 0L
    val rawOut = Array.newBuilder[Byte]

    var fi = 0
    while (fi < t.fields.length) {
      val f = t.fields(fi)
      var off = 0
      var flen = 0
      if (lens == null) { off = base + t.fixedOffsets(fi); flen = f.length }
      else { off = lens(fi)._1; flen = lens(fi)._2 }
      def uint(): Long = { // big-endian unsigned of flen bytes (≤8)
        var v = 0L
        var i = 0
        while (i < flen && i < 8) { v = (v << 8) | (buf.get(off + i) & 0xFF); i += 1 }
        v
      }
      def keepRaw(): Unit = {
        var i = 0
        while (i < flen) { rawOut += buf.get(off + i); i += 1 }
      }
      // Typed parses only at the IE's expected wire size — a template
      // declaring e.g. IE 8 with length 2 must fall through to the
      // length-bounded raw branch, not read 4 bytes past the field (an
      // exporter- or attacker-controlled overread).
      if (f.enterprise.isDefined) keepRaw() // keep, don't mis-parse
      else f.ieId match {
        case IE_OCTETS     => bytes = uint()
        case IE_PACKETS    => packets = uint()
        case IE_PROTOCOL   => protocol = uint().toInt
        case IE_TOS        => tos = uint().toInt
        case IE_TCP_FLAGS  => tcpFlags = uint().toInt
        case IE_SRC_PORT   => srcPort = uint().toInt
        case IE_SRC_V4 if flen == 4 => srcAddr = ipv4(buf.getInt(off))
        case IE_IN_IF      => inIf = uint().toInt
        case IE_DST_PORT   => dstPort = uint().toInt
        case IE_DST_V4 if flen == 4 => dstAddr = ipv4(buf.getInt(off))
        case IE_OUT_IF     => outIf = uint().toInt
        case IE_NEXT_HOP_V4 if flen == 4 => nextHop = ipv4(buf.getInt(off))
        case IE_SRC_AS     => srcAs = uint()
        case IE_DST_AS     => dstAs = uint()
        case IE_START_MS   => startMs = uint()
        case IE_END_MS     => endMs = uint()
        case IE_START_SEC  => startMs = uint() * 1000L
        case IE_END_SEC    => endMs = uint() * 1000L
        case IE_START_UPTIME => startMs = bootMs + uint() // v9 uptime-relative
        case IE_END_UPTIME => endMs = bootMs + uint()
        case IE_SRC_V6 if flen == 16 => srcAddr = ipv6(buf, off)
        case IE_DST_V6 if flen == 16 => dstAddr = ipv6(buf, off)
        case _ => keepRaw()
      }
      fi += 1
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

  /** Options-data record → scope/value uint maps (≤8 B values kept).
    * `lens` null ⇒ fixed template, offsets from `fixedOffsets` + `base`.
    */
  private def decodeOptionsRecord(exporter: String, domain: Long, templateId: Int,
      buf: ByteBuffer, t: Template, base: Int,
      lens: Array[(Int, Int)]): OptionsRecord = {
    var scope = Map.empty[Int, Long]
    var values = Map.empty[Int, Long]
    var fi = 0
    while (fi < t.fields.length) {
      val f = t.fields(fi)
      var off = 0
      var flen = 0
      if (lens == null) { off = base + t.fixedOffsets(fi); flen = f.length }
      else { off = lens(fi)._1; flen = lens(fi)._2 }
      if (f.enterprise.isEmpty && flen <= 8) {
        var v = 0L
        var i = 0
        while (i < flen) { v = (v << 8) | (buf.get(off + i) & 0xFF); i += 1 }
        if (fi < t.scopeCount) scope += (f.ieId -> v)
        else values += (f.ieId -> v)
      }
      fi += 1
    }
    OptionsRecord(exporter, domain, templateId, scope, values)
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
