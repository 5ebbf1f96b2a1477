package graft.queries

import graft.{Q, Tables => T}
import graft.Q._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.graft.{native => gn}

/** Round-4 batch 2 (SURVEY §2.11d): the bloom-filtered join (runtime
  * pre-filter as a declared op), deterministic train/val/test splitting,
  * the typed-Aggregator UDAF promoted to an oracle gate, CDC latest-wins
  * merge/upsert, embedding vector preprocessing, and the
  * arg-min/arg-max aggregate family. Emission contract as everywhere:
  * exact decimal/integer internals, one rounding at the edge,
  * DOUBLE out via SparkEntry.emitDoubles.
  */
object Extra4 {

  val defs: Map[String, Q] = Map(

    // Bloom-filtered join — Spark's runtime-filter idea as a DECLARED
    // operation: the dim side aggregates its keys into one serialized
    // bloom filter (kilobytes), the fact side drops non-members BEFORE
    // the join, the exact join then removes the false positives. At
    // 100 TB this is the difference between shuffling the whole fact
    // table and shuffling the ~selectivity fraction that can match; the
    // oracle is the PLAIN join — the bloom stage must be
    // result-invisible, exactly like join_salted's contract.
    "join_bloom" -> Q(
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty
        |FROM read_parquet('{sfDir}/lineitem.parquet') l
        |JOIN read_parquet('{sfDir}/part.parquet') p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size = 1
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      val dim = T.part(s, d).filter(col("p_size") === 1)
        .select(col("p_partkey"), col("p_brand"))
      val bloom = dim.agg(
        gn.bloom_filter_agg(xxhash64(col("p_partkey")), 4096L, 65536L).as("bf"))
      // The filter is consumed as a scalar subquery (the analyzer's
      // required shape): executed once, broadcast into the probe filter.
      val probe = T.lineitem(s, d).select("l_partkey", "l_quantity")
        .filter(gn.might_contain(gn.scalar_subquery(bloom),
          xxhash64(col("l_partkey"))))
      probe.join(broadcast(dim), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          dec2(sum(dec2(col("l_quantity")))).as("sum_qty"))
        .orderBy("p_brand")
    },

    // Deterministic train/val/test split — the first operation of every
    // training run. TABLESAMPLE is neither stable across engines nor
    // stratified; hashing the key through the Knuth multiplicative hash
    // (a bijection on [0,2³²), no ties) and bucketing mod 100 gives a
    // reproducible 80/10/10 assignment any engine can replay. Pure map +
    // one tiny aggregate: zero wide stages beyond the final 3-group agg.
    // The hash is computed overflow-safely: a plain id*2654435761 wraps
    // i64 for ids above ~3.47e9 (Spark wraps silently, DuckDB errors),
    // so the low half of id is split into 16-bit limbs — a·C mod 2³² =
    // (a0·C + ((a1·C) mod 2¹⁶)·2¹⁶) mod 2³², every term < 2⁴⁸.
    "sample_split" -> Q(
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |    ((((doc_id % 4294967296) % 65536) * 2654435761
        |      + ((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536)
        |     % 4294967296) % 100 AS bkt
        |  FROM '{sfDir}/documents.parquet'),
        |s AS (SELECT CASE WHEN bkt < 80 THEN 'train'
        |                  WHEN bkt < 90 THEN 'val'
        |                  ELSE 'test' END AS split, doc_id, n_chars FROM b)
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          expr("((((doc_id % 4294967296L) % 65536L) * 2654435761L" +
            " + ((((doc_id % 4294967296L) DIV 65536L) * 2654435761L) % 65536L)" +
            " * 65536L) % 4294967296L) % 100").as("bkt"))
        .select(
          when(col("bkt") < 80, "train")
            .when(col("bkt") < 90, "val")
            .otherwise("test").as("split"),
          col("doc_id"), col("n_chars"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("split")
    },

    // The typed Aggregator-via-udaf ladder rung (SURVEY §2.10) promoted
    // from unit-only to oracle-gated: WeightedAvg runs as a real
    // partial+final custom aggregate inside the driver's hash gate.
    // Determinism: x (quantity) and w (linenumber) are integer-valued,
    // every partial sum is an exact integer far below 2⁵³, so the
    // double accumulation is order-independent and both engines perform
    // the identical single division.
    "agg_weighted" -> Q(
      """SELECT l_returnflag,
        |  CAST(ROUND(CAST(SUM(CAST(l_quantity AS BIGINT) * l_linenumber) AS DOUBLE)
        |       / CAST(SUM(l_linenumber) AS DOUBLE), 6) AS DECIMAL(18,6)) AS wavg_qty,
        |  CAST(SUM(l_linenumber) AS BIGINT) AS w_total
        |FROM '{sfDir}/lineitem.parquet'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      s.udf.register("weighted_avg", udaf(graft.functions.WeightedAvg))
      T.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").cast("double").as("x"),
          col("l_linenumber").cast("double").as("w"))
        .groupBy("l_returnflag")
        .agg(expr("weighted_avg(x, w)").as("raw"),
          sum(col("w").cast("long")).as("w_total"))
        .select(col("l_returnflag"),
          round(col("raw"), 6).cast(DecimalType(18, 6)).as("wavg_qty"),
          col("w_total"))
        .orderBy("l_returnflag")
    },

    // CDC merge/upsert — apply a change stream (inserts, conflicting
    // updates, deletes, each with a sequence number) onto a base table,
    // LATEST-WINS per key. The change set is synthesized deterministically
    // from the base so both engines construct the identical stream. Scale
    // shape: one window over the (small) change set for latest-wins
    // compaction, then one left join + one anti join keyed on the base —
    // the standard big-base/small-delta pattern; nothing iterates.
    "merge_upsert" -> Q(
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM read_parquet('{sfDir}/customer.parquet')),
        |chg AS (
        |  SELECT c_custkey AS key, 1 AS seq, 'U' AS op,
        |         CAST(ROUND(bal * CAST(1.05 AS DECIMAL(3,2)), 2) AS DECIMAL(18,2)) AS new_bal,
        |         c_nationkey AS nk
        |  FROM base WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, 2, 'U',
        |         CAST(ROUND(bal * CAST(1.10 AS DECIMAL(3,2)), 2) AS DECIMAL(18,2)),
        |         c_nationkey
        |  FROM base WHERE c_custkey % 14 = 0
        |  UNION ALL
        |  SELECT c_custkey, 3, 'D', NULL, c_nationkey
        |  FROM base WHERE c_custkey % 97 = 0
        |  UNION ALL
        |  SELECT -c_custkey, 1, 'I',
        |         CAST(100.00 AS DECIMAL(18,2)), c_nationkey
        |  FROM base WHERE c_custkey % 131 = 0),
        |latest AS (
        |  SELECT key, op, new_bal, nk FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY key
        |      ORDER BY seq DESC, op) AS rn
        |    FROM chg) t WHERE rn = 1),
        |merged AS (
        |  SELECT b.c_nationkey,
        |         COALESCE(l.new_bal, b.bal) AS bal
        |  FROM base b LEFT JOIN latest l ON b.c_custkey = l.key
        |  WHERE l.op IS NULL OR l.op <> 'D'
        |  UNION ALL
        |  SELECT nk, new_bal FROM latest WHERE op = 'I')
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(bal) AS DECIMAL(18,2)) AS sum_bal
        |FROM merged GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) {
      (s, d) =>
        val base = upsertBase(s, d)
        val chg = upsertChanges(base)
        val w = Window.partitionBy("key").orderBy(col("seq").desc, col("op"))
        val latest = chg.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn", "seq")
        val merged = base
          .join(latest, base("c_custkey") === latest("key"), "left")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("c_nationkey"),
            coalesce(col("new_bal"), col("bal")).as("bal"))
          .union(latest.filter(col("op") === "I")
            .select(col("nk"), col("new_bal")))
        merged.groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_rows"), dec2(sum("bal")).as("sum_bal"))
          .orderBy("c_nationkey")
    },

    // Embedding preprocessing — L2 norm and int8-style quantization of
    // the leading dimensions, the normalize step before any ANN/cosine
    // stage. Determinism: both engines fold the identical left-to-right
    // Σx² over the same float32 values in double (bit-identical IEEE
    // sequence — array order is data, not partitioning), take one sqrt,
    // and round once at the edge. Pure per-row map: no shuffle at all
    // before the final sort.
    "fn_vector" -> Q(
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding]),
        |      (a, b) -> a + b)) AS nrm
        |  FROM read_parquet('{sfDir}/embeddings.parquet'))
        |SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
        |  CAST(ROUND(nrm, 4) AS DECIMAL(18,4)) AS l2_norm,
        |  CAST(ROUND(CAST(embedding[1] AS DOUBLE) / nrm * 127, 0) AS INT) AS q0,
        |  CAST(ROUND(CAST(embedding[2] AS DOUBLE) / nrm * 127, 0) AS INT) AS q1
        |FROM v ORDER BY vec_id""".stripMargin) { (s, d) =>
      T.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          sqrt(expr("aggregate(embedding, CAST(0 AS DOUBLE), " +
            "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")).as("nrm"))
        .select(col("vec_id"), size(col("embedding")).as("n_dims"),
          round(col("nrm"), 4).cast(DecimalType(18, 4)).as("l2_norm"),
          round(expr("CAST(element_at(embedding, 1) AS DOUBLE)") / col("nrm")
            * 127, 0).cast("int").as("q0"),
          round(expr("CAST(element_at(embedding, 2) AS DOUBLE)") / col("nrm")
            * 127, 0).cast("int").as("q1"))
        .orderBy("vec_id")
    },

    // arg-min/arg-max aggregate family: WHICH row carries the extreme,
    // not just the extreme value. max_by/min_by with a (value, id) struct
    // ordering is fully partial-aggregatable (one struct per group and
    // phase crosses the shuffle) and the composite key makes ties
    // deterministic — the window-free way to answer "latest/largest per
    // key" at scale. Oracle states the same rows via ROW_NUMBER.
    "agg_argminmax" -> Q(
      """WITH r AS (
        |  SELECT event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id DESC) AS rhi,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value ASC, event_id ASC) AS rlo
        |  FROM read_parquet('{sfDir}/events.parquet'))
        |SELECT event_type,
        |  CAST(MAX(CASE WHEN rhi = 1 THEN event_id END) AS BIGINT) AS hi_event,
        |  CAST(MAX(CASE WHEN rlo = 1 THEN event_id END) AS BIGINT) AS lo_event,
        |  CAST(ROUND(MAX(value), 4) AS DECIMAL(18,4)) AS hi_value,
        |  CAST(ROUND(MIN(value), 4) AS DECIMAL(18,4)) AS lo_value
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      T.events(s, d)
        .groupBy("event_type")
        .agg(expr("max_by(event_id, struct(value, event_id))").as("hi_event"),
          expr("min_by(event_id, struct(value, event_id))").as("lo_event"),
          round(max("value"), 4).cast(DecimalType(18, 4)).as("hi_value"),
          round(min("value"), 4).cast(DecimalType(18, 4)).as("lo_value"))
        .orderBy("event_type")
    }
  )

  /** The customer base relation of [[defs merge_upsert]] in CDC state
    * shape — shared with StreamBatchParitySpec so the streaming
    * foreachBatch apply starts from the identical table.
    */
  private[graft] def upsertBase(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    T.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"),
        dec2(col("c_acctbal")).as("bal"))

  /** The synthesized CDC change set of merge_upsert (key, seq, op,
    * new_bal, nk) — shared with StreamBatchParitySpec so the streaming
    * twin replays bit-identical changes through foreachBatch.
    */
  private[graft] def upsertChanges(
      base: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val upd = expr(
      "CAST(round(bal * CAST(1.05 AS DECIMAL(3,2)), 2) AS DECIMAL(18,2))")
    val upd2 = expr(
      "CAST(round(bal * CAST(1.10 AS DECIMAL(3,2)), 2) AS DECIMAL(18,2))")
    base.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("key"), lit(1).as("seq"), lit("U").as("op"),
        upd.as("new_bal"), col("c_nationkey").as("nk"))
      .union(base.filter(col("c_custkey") % 14 === 0)
        .select(col("c_custkey"), lit(2), lit("U"), upd2, col("c_nationkey")))
      .union(base.filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey"), lit(3), lit("D"),
          lit(null).cast(DecimalType(18, 2)), col("c_nationkey")))
      .union(base.filter(col("c_custkey") % 131 === 0)
        // Insert keys live OUTSIDE the base key domain by construction
        // (negation — base custkeys are strictly positive), so a
        // synthesized insert can never collide with a real update at
        // any SF; the op tiebreak in the consumer makes latest-wins a
        // total order even if a future change stream carries same-seq
        // rows.
        .select(-col("c_custkey"), lit(1), lit("I"),
          lit(BigDecimal("100.00")).cast(DecimalType(18, 2)),
          col("c_nationkey")))
  }
}
