package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY §2.10 [N]): image/audio/video as opaque
  * `binary` columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The container has no media libraries, so the *codec* is a
  * clearly-marked deterministic fake (`StubCodec`) — parse a synthetic
  * header, derive pseudo-features from content hashes. Everything
  * Spark-side is real and load-bearing: the schema, the binary header
  * parsing as Catalyst expressions, the per-partition codec-init batch
  * shape (`mapPartitions`, the Scala analog of `mapInPandas` batching),
  * and the explode-based frame sampling.
  *
  * Fake wire format (big-endian): [0]=kind tag (1 img / 2 audio / 3
  * video), [1..2]=width, [3..4]=height, [5..8]=duration_ms, [9..]=payload.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("bytes", BinaryType)))

  /** Deterministic synthetic media table (tests/demo). */
  def synthesize(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val kindTag = (i % 3) + 1
      val kind = Seq("image", "audio", "video")(i % 3)
      val w = 64 + (i * 37) % 512
      val h = 64 + (i * 53) % 512
      val durMs = 1000 + (i * 997) % 60000
      val payload = Array.tabulate[Byte](32)(j => ((i * 131 + j * 7) % 256).toByte)
      val header = Array[Byte](
        kindTag.toByte,
        (w >> 8).toByte, w.toByte,
        (h >> 8).toByte, h.toByte,
        (durMs >> 24).toByte, (durMs >> 16).toByte, (durMs >> 8).toByte, durMs.toByte)
      (i.toLong, kind, header ++ payload)
    }.toDF("media_id", "kind", "bytes")
  }

  /** Header → typed metadata, pure Catalyst expressions (binary substring
    * + hex/conv) — no codec involvement, so it pushes/prunes/codegens
    * like any column op.
    */
  def extractMeta(media: DataFrame): DataFrame = {
    def beInt(start: Int, len: Int) =
      conv(hex(expr(s"substring(bytes, $start, $len)")), 16, 10).cast(IntegerType)
    media
      .withColumn("meta", struct(
        beInt(2, 2).as("width"),
        beInt(4, 2).as("height"),
        beInt(6, 4).as("duration_ms"),
        (length(col("bytes")) - 9).as("payload_bytes")))
  }

  /** Resize plan: metadata transform only (a real impl would re-encode the
    * payload in [[StubCodec]]); clamps the longer edge to `maxEdge`
    * preserving aspect ratio, integer arithmetic only.
    */
  def resize(withMeta: DataFrame, maxEdge: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scaleNeeded = greatest(w, h) > maxEdge
    def scaled(c: org.apache.spark.sql.Column) =
      when(scaleNeeded, (c * maxEdge / greatest(w, h)).cast(IntegerType)).otherwise(c)
    withMeta.withColumn("meta", struct(
      scaled(w).as("width"), scaled(h).as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.payload_bytes").as("payload_bytes")))
  }

  /** Frame sampling: one row per sampled frame at `everyMs` intervals —
    * explode over a sequence, the Generator (UDTF) path; frame payload
    * decode is left to [[StubCodec]] downstream.
    */
  def sampleFrames(withMeta: DataFrame, everyMs: Int): DataFrame =
    withMeta
      // zero-duration media yields zero frames: the naive sequence(0,
      // duration-1) is sequence(0, -1), which Spark rejects at runtime
      // ("Illegal sequence boundaries") — one truncated clip would kill
      // the whole job
      .filter(col("meta.duration_ms") > 0)
      .withColumn("frame_ms", explode(
        sequence(lit(0), col("meta.duration_ms") - 1, lit(everyMs))))
      .select(col("media_id"), col("kind"), col("frame_ms"), col("bytes"))

  final case class MediaFeatures(media_id: Long, kind: String, feature: Array[Float])

  /** The codec seam. A production build binds an actual decoder here
    * (per-partition init — load native libs once, stream the rows
    * through); this sandbox has none, so decode is a DETERMINISTIC FAKE:
    * features are derived from a rolling hash of the payload bytes.
    * The batch shape, schema and partitioning are the real contract.
    */
  object StubCodec {
    val featureDim = 16

    def decodeAndFeaturize(media: DataFrame): Dataset[MediaFeatures] = {
      val spark = media.sparkSession
      import spark.implicits._
      media.select(col("media_id"), col("kind"), col("bytes"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions { it =>
          // Real impl: val codec = NativeCodec.open()  (once per partition)
          it.map { case (id, kind, bytes) =>
            MediaFeatures(id, kind, fakeFeatures(bytes))
          }
          // Real impl: codec.close() via CompletionIterator
        }
    }

    /** ??? in a real build — replaced by pixel/spectrogram features.
      * Here: deterministic per-byte rolling hash folded into a fixed-dim
      * unit-normalized vector, so tests can assert exact outputs.
      */
    private[ops] def fakeFeatures(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Double](featureDim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) {
        h = 31L * h + bytes(i)
        acc(i % featureDim) += (h % 1000L) / 1000.0
        i += 1
      }
      val norm = math.sqrt(acc.map(x => x * x).sum)
      acc.map(x => if (norm == 0.0) 0.0f else (x / norm).toFloat)
    }
  }
}
