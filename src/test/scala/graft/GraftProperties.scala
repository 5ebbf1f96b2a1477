package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.{CosineSimilarity, FirstCommonSorted, IntersectSizeSorted, MinHashSignature, SimHash64}
import graft.streaming.NetFlowCodec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

/** ScalaCheck properties (SURVEY §5): decode∘encode = id on generated v5
  * flows; algebraic laws of the native sketch kernels (pure expression
  * eval — no SparkSession needed).
  */
object GraftProperties extends Properties("graft") {

  // ------------------------------------------------ v5 encode ∘ decode = id
  final case class V5Flow(src: Int, dst: Int, srcPort: Int, dstPort: Int,
      proto: Int, flags: Int, packets: Long, bytes: Long,
      firstOff: Long, lastOff: Long)

  private val genFlow: Gen[V5Flow] = for {
    src <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    dst <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    sp <- Gen.chooseNum(0, 65535)
    dp <- Gen.chooseNum(0, 65535)
    proto <- Gen.chooseNum(0, 255)
    flags <- Gen.chooseNum(0, 255)
    pkts <- Gen.chooseNum(0L, 0xFFFFFFFFL)
    bytes <- Gen.chooseNum(0L, 0xFFFFFFFFL)
    first <- Gen.chooseNum(0L, 50000L)
    dur <- Gen.chooseNum(0L, 9999L)
  } yield V5Flow(src, dst, sp, dp, proto, flags, pkts, bytes, first, first + dur)

  private val sysUptime = 60000L
  private val unixSecs = 1700000000L

  private def encodeV5(flows: List[V5Flow]): Array[Byte] = {
    val buf = ByteBuffer.allocate(24 + 48 * flows.size).order(ByteOrder.BIG_ENDIAN)
    buf.putShort(5).putShort(flows.size.toShort)
      .putInt(sysUptime.toInt).putInt(unixSecs.toInt).putInt(0)
      .putInt(0).put(0.toByte).put(0.toByte).putShort(0)
    flows.foreach { f =>
      buf.putInt(f.src).putInt(f.dst).putInt(0)
        .putShort(0).putShort(0)
        .putInt(f.packets.toInt).putInt(f.bytes.toInt)
        .putInt(f.firstOff.toInt).putInt(f.lastOff.toInt)
        .putShort(f.srcPort.toShort).putShort(f.dstPort.toShort)
        .put(0.toByte).put(f.flags.toByte).put(f.proto.toByte).put(0.toByte)
        .putShort(0).putShort(0).put(0.toByte).put(0.toByte).putShort(0)
    }
    buf.array()
  }

  property("v5 decode ∘ encode = id") =
    forAll(Gen.listOfN(5, genFlow).flatMap(l => Gen.choose(0, 5).map(n => l.take(n)))) { flows =>
      val res = NetFlowCodec.decode("prop", 0L, encodeV5(flows), Map.empty)
      val bootMs = unixSecs * 1000L - sysUptime
      res.errors.isEmpty &&
      res.records.size == flows.size &&
      res.records.zip(flows).forall { case (r, f) =>
        r.src_port == f.srcPort && r.dst_port == f.dstPort &&
        r.protocol == f.proto && r.tcp_flags == f.flags &&
        r.packets == f.packets && r.bytes == f.bytes &&
        r.start_ts.getTime == bootMs + f.firstOff &&
        r.end_ts.getTime == bootMs + f.lastOff &&
        r.duration_ms == f.lastOff - f.firstOff
      }
    }

  // ----------------------------------------------- native kernel algebra
  private def cosEval(a: Array[Float], b: Array[Float]): Double =
    CosineSimilarity(
      Literal(new GenericArrayData(a), ArrayType(FloatType)),
      Literal(new GenericArrayData(b), ArrayType(FloatType)))
      .eval(null).asInstanceOf[Double]

  private val genVec: Gen[Array[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 10.0f))
      .map(_.toArray).suchThat(v => v.exists(_ != 0.0f))

  // ----------------------------------------- decode is total (fuzz)
  // The network-facing entry point must never throw, whatever bytes
  // arrive — including bytes that START like v5/v9/IPFIX and corrupt
  // from there (hostile templates, truncated sets, var-len prefixes
  // running past the end).
  private val genGarbage: Gen[Array[Byte]] = Gen.oneOf(
    Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte)),
    for { // plausible header, random body
      ver <- Gen.oneOf(5, 9, 10)
      body <- Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))
    } yield {
      val b = ByteBuffer.allocate(2 + body.length).order(ByteOrder.BIG_ENDIAN)
      b.putShort(ver.toShort).put(body)
      b.array()
    })

  property("decode is total on arbitrary and half-plausible bytes") =
    forAll(genGarbage) { bytes =>
      val res = NetFlowCodec.decode("fuzz", 0L, bytes, Map.empty)
      // Never throws; whatever it returns is structurally sane.
      res.records.forall(_ != null) && res.templates != null && res.options != null
    }

  property("cosine(a, a) = 1") = forAll(genVec) { v =>
    math.abs(cosEval(v, v) - 1.0) < 1e-9
  }

  property("cosine symmetric and bounded") = forAll(genVec, genVec) { (a, b) =>
    val ab = cosEval(a, b)
    val ba = cosEval(b, a)
    ab == ba && ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9
  }

  property("cosine scale-invariant") = forAll(genVec, Gen.chooseNum(1, 50)) { (v, k) =>
    val scaled = v.map(_ * k)
    math.abs(cosEval(v, scaled) - 1.0) < 1e-9
  }

  // first_common_sorted == min(A ∩ B) on sorted inputs — the contract
  // that lets IvfIndex swap it in for array_min(array_intersect).
  private def fcsEval(a: Array[Long], b: Array[Long]): Any =
    FirstCommonSorted(
      Literal(new GenericArrayData(a), ArrayType(LongType)),
      Literal(new GenericArrayData(b), ArrayType(LongType))).eval(null)

  private val genSortedLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 40L)).map(_.distinct.sorted.toArray)

  property("first_common_sorted = min of intersection") =
    forAll(genSortedLongs, genSortedLongs) { (a, b) =>
      val inter = a.toSet.intersect(b.toSet)
      val expect: Any = if (inter.isEmpty) null else inter.min
      fcsEval(a, b) == expect
    }

  // sq_dist_long == Σ(a_i − b_i)² on equal-length inputs — the exact
  // integer contract behind eval_confusion's r16 kernel swap (the
  // aggregate(zip_with) lambda form it replaces is the reference).
  // r17 (ADVICE r16): ragged inputs now FAIL loudly instead of summing
  // the common prefix, and a null element yields NULL instead of the
  // garbage 0 getLong reads from a null slot — both pinned here.
  property("sq_dist_long = exact integer squared distance (equal lengths)") =
    forAll(Gen.listOf(Gen.chooseNum(-2000000L, 2000000L))) { a =>
      val b = a.map(x => -x) // same length by construction
      val expect = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      graft.functions.SquaredDistanceLong(
        Literal(new GenericArrayData(a.toArray), ArrayType(LongType)),
        Literal(new GenericArrayData(b.toArray), ArrayType(LongType)))
        .eval(null) == expect
    }

  property("sq_dist_long fails loudly on ragged inputs") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L))) { a =>
      val b = a ++ List(1L) // strictly longer
      try {
        graft.functions.SquaredDistanceLong(
          Literal(new GenericArrayData(a.toArray), ArrayType(LongType)),
          Literal(new GenericArrayData(b.toArray), ArrayType(LongType)))
          .eval(null)
        false
      } catch { case e: IllegalArgumentException =>
        e.getMessage.contains("length mismatch")
      }
    }

  property("sq_dist_long yields NULL on a null element") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L))) { a =>
      val withNull: Array[Any] = a.toArray.map(x => x: Any)
      withNull(0) = null
      graft.functions.SquaredDistanceLong(
        Literal(new GenericArrayData(withNull),
          ArrayType(LongType, containsNull = true)),
        Literal(new GenericArrayData(a.toArray),
          ArrayType(LongType, containsNull = true)))
        .eval(null) == null
    }

  // intersect_size_sorted == |A ∩ B| on sorted duplicate-free inputs —
  // the contract behind the dedup verify-stage swap.
  property("intersect_size_sorted = exact intersection size") =
    forAll(genSortedLongs, genSortedLongs) { (a, b) =>
      IntersectSizeSorted(
        Literal(new GenericArrayData(a), ArrayType(LongType)),
        Literal(new GenericArrayData(b), ArrayType(LongType)))
        .eval(null) == a.toSet.intersect(b.toSet).size
    }

  private def sigEval(hs: Array[Long], k: Int): Seq[Long] =
    MinHashSignature(Literal(new GenericArrayData(hs), ArrayType(LongType)), k)
      .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq

  private val genHashes: Gen[Array[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 2147483646L)).map(_.toArray)

  property("minhash signature is order- and duplicate-invariant (set semantics)") =
    forAll(genHashes, Gen.chooseNum(0L, 1L)) { (hs, seed) =>
      val shuffled = hs.reverse ++ hs.take((seed % hs.length).toInt)
      sigEval(hs, 32) == sigEval(shuffled, 32)
    }

  property("minhash signature of a subset dominates (element-wise >=)") =
    forAll(genHashes) { hs =>
      val subset = hs.take(math.max(1, hs.length / 2))
      sigEval(subset, 32).zip(sigEval(hs, 32)).forall { case (s, f) => s >= f }
    }

  private def simhashEval(hs: Array[Long]): Long =
    SimHash64(Literal(new GenericArrayData(hs), ArrayType(LongType)))
      .eval(null).asInstanceOf[Long]

  property("simhash is order-invariant over the multiset") =
    forAll(genHashes) { hs => simhashEval(hs) == simhashEval(hs.reverse) }

  property("one extra element flips few simhash bits on large docs") =
    forAll(Gen.listOfN(200, Gen.chooseNum(Long.MinValue, Long.MaxValue)),
        Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (hs, extra) =>
      val base = simhashEval(hs.toArray)
      val plus = simhashEval((extra :: hs).toArray)
      java.lang.Long.bitCount(base ^ plus) <= 16
    }

  // ------------------------------------------------ count-min laws
  // JVM-side estimate: must agree with what estimateSql computes, so the
  // replay contract (JVM fold, SQL probe) can never silently diverge —
  // the index arithmetic appears ONCE here and once in the SQL string.
  private def cmEstimate(buf: Array[Long], h: Long): Long = {
    import graft.functions.CountMinAgg.{depth, width}
    (0 until depth).map { i =>
      buf(i * width + ((h >>> (56 - 8 * i)) & 0xFFL).toInt)
    }.min
  }

  property("count-min never under-counts; merge order is irrelevant") =
    forAll(Gen.listOfN(300, Gen.chooseNum(Long.MinValue, Long.MaxValue))) { hs =>
      val cm = graft.functions.CountMinAgg
      val whole = hs.foldLeft(cm.zero)(cm.reduce)
      val (l, r) = hs.splitAt(hs.length / 2)
      val merged = cm.merge(l.foldLeft(cm.zero)(cm.reduce),
        r.foldLeft(cm.zero)(cm.reduce))
      val exact = hs.groupBy(identity).view.mapValues(_.size.toLong)
      whole.sameElements(merged) &&
        exact.forall { case (h, n) => cmEstimate(whole, h) >= n }
    }

  property("unicode normalize: idempotent; NFD and NFC inputs confluent") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ü', 'ñ', 'Å', ' ', '\t', '中')))
        .map(_.mkString)) { s =>
      import org.apache.spark.unsafe.types.UTF8String
      def run(form: String, in: String): String =
        graft.functions.UnicodeNormalize(
          Literal(UTF8String.fromString(in),
            org.apache.spark.sql.types.StringType), form)
          .eval(null).asInstanceOf[UTF8String].toString
      val nfc = run("NFC", s)
      val nfd = run("NFD", s)
      // idempotence, confluence (NFC of the fully-decomposed form lands
      // on the same string), and agreement with the JDK applied directly
      run("NFC", nfc) == nfc &&
        run("NFC", nfd) == nfc &&
        nfc == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  property("count-min SQL probe replays the JVM index arithmetic") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { h =>
      // the SQL string hard-codes shift/mask constants; recompute the
      // addressed cells from the string and compare against idx() output
      val sql = graft.functions.CountMinAgg.estimateSql("buf", "x")
      val addressed = "(\\d+) \\+ CAST\\(shiftrightunsigned\\(xxhash64\\(x\\), (\\d+)\\)".r
        .findAllMatchIn(sql)
        .map(m => m.group(1).toInt + ((h >>> m.group(2).toInt) & 0xFFL).toInt)
        .toSet
      val buf = graft.functions.CountMinAgg.reduce(
        graft.functions.CountMinAgg.zero, h)
      // exactly the cells the JVM reduce incremented are addressed
      addressed == buf.zipWithIndex.collect { case (v, i) if v == 1L => i }.toSet
    }
}
