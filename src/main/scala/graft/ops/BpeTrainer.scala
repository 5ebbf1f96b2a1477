package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative BPE tokenizer training (the loop `text_bpe_pairs` declared
  * round 1 of): per merge round, count adjacent token pairs over the
  * FREQUENCY-COMPRESSED vocabulary, pick the argmax pair, merge its
  * non-overlapping left-to-right occurrences in every word, repeat —
  * the Sennrich et al. 2016 trainer, in the SentencePiece operating
  * model (pair counting on the distinct-word relation carrying corpus
  * counts, never on the token stream — Heaps' law keeps the vocab
  * sublinear in corpus size, so per-round cost is corpus-independent
  * after the one word-count rollup).
  *
  * Token-state representation is the scale-and-determinism trick: each
  * word's token sequence is a chr(31)-JOINED STRING (tokens can be
  * multi-char after merges; the separator marks boundaries), and
  * applying a merge is one literal `replace(ws, a║b → ab)` — string
  * replace is left-to-right non-overlapping in BOTH engines (verified:
  * "a║a║a" replacing "a║a" yields "aa║a" on Spark/Java and DuckDB
  * alike), which IS greedy BPE merge semantics, with no per-position
  * window or sequential UDF anywhere. Pair counts use ALL adjacent
  * positions (the reference trainer's zip count — "aaa" counts (a,a)
  * twice), via the same transform/explode shape as text_bigram_lm.
  *
  * Determinism: integer counts; argmax ties break (n DESC, a, b) under
  * binary string order — identical on both engines; replace is literal
  * (no regex). The `size(t) >= 2` guard per round is LOAD-BEARING on
  * the Spark side: a fully-merged 1-token word would hit the
  * sequence(0, -1) DESCENDING trap (text_bigram_lm's lesson) — DuckDB's
  * generate_series is simply empty there.
  *
  * Lineage discipline (the Components recipe, not PageRank's every-8:
  * each round references the previous vocab state TWICE — pair counts
  * and the merge — so the plan would DOUBLE per round): the vocab state
  * is lazily localCheckpointed every round, bounding plan depth at one
  * round regardless of k. The argmax stays IN-PLAN (TakeOrdered(1) →
  * broadcast crossJoin): constructing the query runs no Spark job, the
  * PlanSpec contract.
  */
object BpeTrainer {

  /** One row per merge round: (round, p1, p2, n_occ, tot_tokens) —
    * the picked pair, its weighted adjacent-occurrence count at pick
    * time, and the corpus token total AFTER applying the merge. The
    * token total makes the oracle gate sensitive to merge-APPLICATION
    * errors (greedy overlap handling included), not just pair ranking:
    * tot = Σ f·(tokens per word), so one wrong replacement anywhere
    * shifts it.
    */
  def merges(docs: DataFrame, rounds: Int): DataFrame =
    trainLoop(docs, rounds)._2.reduce(_ unionAll _).orderBy("round")

  /** The trained tokenizer's ENCODE side: the vocabulary after `rounds`
    * merges as (word, ntok) — each distinct corpus word with the number
    * of tokens the trained merges leave it at. Encoding a document is a
    * word-keyed join against this relation (the inference half of the
    * trainer loop — together they close the tokenizer lifecycle):
    * stripping the separators recovers the original word (merges only
    * remove separators, never characters), so `word` stays unique and
    * joinable. Single-character words never enter the trainer (no pairs
    * to carry) and encode as 1 token — callers coalesce the join miss.
    */
  def encodedVocab(docs: DataFrame, rounds: Int): DataFrame =
    trainLoop(docs, rounds)._1.select(
      expr("replace(ws, chr(31), '')").as("word"),
      size(split(col("ws"), "")).cast("long").as("ntok"))

  /** The shared k-round loop: (final vocab state, one 1-row frame per
    * round). The per-round frames are lazy — `merges` unions them,
    * `encodedVocab` never executes them (each round's argmax is already
    * embedded in the final state's lineage either way).
    */
  private def trainLoop(
      docs: DataFrame, rounds: Int): (DataFrame, Seq[DataFrame]) = {
    require(rounds >= 1, s"BpeTrainer: rounds must be >= 1, got $rounds")
    val sep = "\u001f"
    // Frequency-compressed vocab: (ws = chars joined by chr(31), f).
    // length >= 2: single-char words carry no pairs at any round and
    // chr(31) never occurs in the fixture words (and if it did, both
    // engines would shingle it identically — the convention is shared,
    // not load-bearing).
    var wf = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .select(expr(
        "array_join(transform(sequence(1, length(word)), " +
          "i -> substring(word, i, 1)), chr(31))").as("ws"), col("f"))
      .transform(graft.Q.cut(_, eager = false))
    val out = (1 to rounds).map { r =>
      val pairs = wf
        .select(col("f"), split(col("ws"), sep).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(0, size(t) - 2), " +
            "i -> struct(t[i] AS a, t[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("f")).as("n"))
      val best = pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1)
      wf = wf.crossJoin(broadcast(best.select(col("a"), col("b"))))
        .select(expr(
          "replace(ws, concat(a, chr(31), b), concat(a, b))").as("ws"),
          col("f"))
        .transform(graft.Q.cut(_, eager = false))
      val tot = wf.agg(
        sum(col("f") * size(split(col("ws"), sep))).as("tot_tokens"))
      best.select(lit(r).as("round"), col("a").as("p1"), col("b").as("p2"),
          col("n").as("n_occ"))
        .crossJoin(broadcast(tot))
    }
    (wf, out)
  }
}
