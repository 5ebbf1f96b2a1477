package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Incremental (delta) dedup: classify a NEW batch of documents against a
  * STANDING corpus — the operating mode a real 100 TB pipeline runs in.
  * Nobody re-dedups the world per ingest; the daily batch is checked
  * against the corpus, and only novel documents are admitted.
  *
  * Each new document is flagged:
  *   - `exact` — its text equals some corpus document's text;
  *   - `near`  — not exact, but word-n-gram Jaccard ≥ `threshold`
  *     against some corpus document;
  *   - `novel` — neither.
  *
  * Scale shape (the whole point of the operator):
  *   - The CORPUS side is NEVER self-joined — LSH bands of the new batch
  *     probe LSH bands of the corpus (an asymmetric equi-join), so cost
  *     is O(|new| · collisions), not O(|corpus|²). With |new| ≪ |corpus|
  *     (the daily-delta regime) the corpus-side band relation is the
  *     thing you'd persist as a table between runs — it only needs
  *     appending as the corpus grows.
  *   - The exact layer joins on an 8-byte xxhash64 digest with a
  *     text-equality residual inside the hash bucket: the shuffle key is
  *     fixed-width, and full texts are only compared on digest collision.
  *   - Near-dup candidates are skinny (new_id, corpus_id) pairs; the
  *     exact-Jaccard verify re-attaches the hashed-shingle arrays to
  *     candidates only (the [[Sketches.minhashNearDups]] discipline —
  *     never all-pairs).
  *
  * Same recall contract as `dedup_minhash`: the LSH candidate generator
  * is measured recall-complete at `threshold` = 0.5 on the fixtures
  * (new×corpus pairs are a subset of the all-pairs set the symmetric
  * sweep validated), and the driver's ground-truth oracle (exact
  * inverted-index Jaccard restricted to new×corpus) would fail the hash
  * gate if a true near-dup pair were ever dropped.
  */
object IncrementalDedup {

  /** Per-document classification: (doc_id, source, cls) for every row of
    * `fresh`, with cls ∈ {'exact', 'near', 'novel'} (priority: exact >
    * near — an exact dup is trivially Jaccard-1 but reports as 'exact').
    *
    * `fresh` / `corpus`: (doc_id, text, source) with globally unique
    * doc_ids across both sides.
    */
  def classify(fresh: DataFrame, corpus: DataFrame, threshold: Double = 0.5,
      k: Int = 64, bands: Int = 16, rows: Int = 4,
      shingleN: Int = 3): DataFrame = {
    require(bands * rows == k,
      s"IncrementalDedup: bands ($bands) * rows ($rows) must equal k ($k)")

    // ---- exact layer: digest equi-join, text-equality residual.
    val exactIds = fresh
      .select(col("doc_id"), xxhash64(col("text")).as("h"), col("text"))
      .join(corpus.select(xxhash64(col("text")).as("ch"),
          col("text").as("ctext")),
        col("h") === col("ch") && col("text") === col("ctext"), "left_semi")
      .select(col("doc_id"))

    // ---- near layer: asymmetric LSH probe. Both shingle relations are
    // branched twice (banding + verify), so persist the skinny
    // (doc_id, array<long>) rows once each.
    val hf = Sketches.hashedShingles(fresh.select("doc_id", "text"), shingleN)
      .transform(graft.Q.sketchPersist)
    val hc = Sketches.hashedShingles(corpus.select("doc_id", "text"), shingleN)
      .transform(graft.Q.sketchPersist)
    val bf = Sketches.bandedSigs(Sketches.signaturesOf(hf, k), bands, rows)
      .select(col("doc_id").as("fid"), col("band"), col("bsig"))
    val bc = Sketches.bandedSigs(Sketches.signaturesOf(hc, k), bands, rows)
      .select(col("doc_id").as("cid"), col("band").as("band2"),
        col("bsig").as("bsig2"))
    // new-batch bands probe corpus bands: the ONLY pair-generating join,
    // and the corpus appears on exactly one side of it.
    val cands = bf.join(bc,
        col("band") === col("band2") && col("bsig") <=> col("bsig2"))
      .select("fid", "cid").distinct()
    // Project inter_n/union_n once, then filter on the columns — the
    // minhashNearDups shape: a Filter predicate re-evaluates
    // array_intersect per reference (FilterExec does no CSE), which
    // would double the array work per candidate.
    val nearIds = cands
      .join(hf.select(col("doc_id").as("fid"), col("hs").as("g1")), "fid")
      .join(hc.select(col("doc_id").as("cid"), col("hs").as("g2")), "cid")
      .select(col("fid"),
        org.apache.spark.sql.graft.native
          .intersect_size_sorted(col("g1"), col("g2")).as("inter_n"),
        (size(col("g1")) + size(col("g2"))).as("sz_sum"))
      .filter(col("inter_n") >= (col("sz_sum") - col("inter_n")) * threshold)
      .select(col("fid").as("doc_id")).distinct()

    // ---- classification: two broadcast-sized flag attaches (the flagged
    // subsets are ≤ |new batch|; at the daily-delta regime they are tiny
    // next to the corpus — and they never touch the corpus again).
    fresh.select(col("doc_id"), col("source"))
      .join(exactIds.withColumn("is_exact", lit(true)), Seq("doc_id"), "left")
      .join(nearIds.withColumn("is_near", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("is_exact"), lit("exact"))
          .when(col("is_near"), lit("near"))
          .otherwise(lit("novel")).as("cls"))
  }

  /** Streaming admission filter — [[classify]]'s exact layer in the form
    * an INGEST pipeline runs it: a stream of candidate documents
    * anti-joined per micro-batch against the standing corpus, so only
    * documents whose text does not already exist in the corpus pass.
    * Stream-static LEFT ANTI equi-join on the 8-byte digest with a
    * text-equality residual (digest collisions cannot drop a novel doc);
    * the static side is re-resolved each batch, so a corpus table that
    * grows between batches is picked up without restarting the query.
    * StreamingSpec pins the semantics on a MemoryStream.
    */
  def admitNovel(stream: DataFrame, corpus: DataFrame): DataFrame = {
    val c = corpus.select(xxhash64(col("text")).as("ch"),
      col("text").as("ctext"))
    stream.join(c,
      xxhash64(col("text")) === col("ch") && col("text") === col("ctext"),
      "left_anti")
  }

  /** [[admitNovel]]'s embedding-space twin: a stream of (vec_id,
    * embedding) rows admitted iff NO standing-corpus vector sits at
    * rounded cosine ≥ `tau` — the semantic admission gate an embedding
    * ingest runs in front of a vector store.
    *
    * Why foreachBatch and not a stream-static join: "drop the doc if ANY
    * candidate is in range" is a per-document EXISTS over the exploded
    * (table, bucket) probe rows — an aggregation after a join, which
    * append-mode stream-static plans cannot express without watermark
    * machinery the (un-timestamped) admission stream doesn't have.
    * foreachBatch runs the batch-proven asymmetric probe
    * ([[Sketches.annJoin]] — corpus contributes bucket anchors only,
    * never self-joined) per micro-batch, the standard production
    * pattern for per-batch set logic. Exactly-once composes with an
    * idempotent sink the same way every foreachBatch pipeline does.
    *
    * `stageCorpus` picks the corpus-side trade: `false` (default)
    * recomputes the bucket anchors per batch — the static frame is
    * re-resolved anyway, so a GROWING corpus table is picked up
    * without restarting the query; `true` computes the anchors ONCE
    * and persists them ([[graft.Q.sketchPersist]]) — the production
    * form for a standing corpus, measured ~2× throughput at small
    * batches / ~1.3× at large (AdmitRateProbe r13), at the cost that
    * corpus growth needs a query restart (or an appended anchor table,
    * which is how a real deployment runs it). The probe's bigger
    * finding (refined r14): CANDIDATE VOLUME is the throughput, and
    * `p` must be designed for the gate's ACTUAL τ on both axes —
    * tables (the τ=0.44 law's 49 tables cap at ~400 rows/s where the
    * τ=0.95 edge ×4 = 8 tables runs 2.3k) and, the larger lever, BIT
    * DEPTH: at τ=0.95 the per-hyperplane agreement p ≈ 0.9 keeps
    * p^nbits workable at 12 bits, so the probed fraction
    * (1+nbits)/2^nbits falls 6.4× below the occupancy-law 9 bits —
    * measured 2.4k/7.1k/12.7k rows/s at batches 1k/4k/16k (staged,
    * LshParams(12, 8, 1), admission sets exact on every batch), vs
    * 1.6k/2.7k/2.3k at the law bits. An Int8Index-served variant of
    * this gate was built and measured SLOWER than every LSH form —
    * see AdmitRateProbe's negative-result note.
    *
    * Returns the configured writer; the caller picks trigger/checkpoint
    * and calls `.start()`. `sink` receives (admitted-batch, batchId).
    */
  def admitNovelSemantic(stream: DataFrame, corpus: DataFrame,
      p: Sketches.LshParams, tau: Double,
      stageCorpus: Boolean = false)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val staged =
      if (stageCorpus)
        Some(Sketches.corpusAnchors(corpus, p).transform(graft.Q.sketchPersist))
      else None
    stream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val near = staged match {
          case Some(anchors) => Sketches.annJoinWith(batch, corpus, anchors, p)
          case None          => Sketches.annJoin(batch, corpus, p)
        }
        val drop = near.filter(col("sim") >= tau)
          .select(col("id1").as("vec_id")).distinct()
        sink(batch.join(drop, Seq("vec_id"), "left_anti"), id)
      }
  }
}
