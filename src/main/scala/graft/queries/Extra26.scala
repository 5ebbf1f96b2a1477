package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-16 additions (VERDICT r15 task list):
  *
  *   - `table_snapshot` / `table_incremental`: the native snapshot /
  *     time-travel table family over `ops/SnapshotTable` — the one
  *     operating model the board did not yet declare (VERDICT r15 #2).
  *   - `eval_reliability`: the isotonic (PAVA) reliability curve that
  *     completes the calibration story next to ECE/Brier (r15 #6).
  *
  * Determinism contracts as established: integer/decimal arithmetic,
  * total output orders, no rand(), no UDFs. The snapshot store derives
  * version v from `o_orderkey % 3 == v-1`, so DuckDB replays any
  * snapshot/diff over the ORIGINAL parquet with the same modulo filter —
  * the gate proves the manifest machinery is lossless (loses no rows,
  * leaks no uncommitted ones).
  */
object Extra26 {

  /** Isotonic reliability fit over a (cu, pos) frame — cu = confidence
    * in integer nano-units, pos ∈ {0,1} — on eval_calibration's 10
    * fixed-width bins. The fitted per-bin rate is the NON-DECREASING
    * sequence minimizing squared error to the observed rates, i.e. the
    * pool-adjacent-violators solution (Ayer 1955; Zadrozny–Elkan 2002
    * use exactly this as the classifier-calibration curve), computed by
    * its closed min-max form  f(i) = max_{j≤i} min_{k≥i} rate(j..k)
    * instead of the sequential pooling loop: PAVA's stack algorithm is
    * inherently serial, but the min-max form is a JOIN over the bin
    * domain — and the bin domain is ≤10 rows BY CONSTRUCTION, so every
    * window/join below runs on a collapsed constant-bounded relation
    * (the agg_spearman argument), regardless of corpus size. The ONE
    * corpus-sized pass is the map-side quantize + 10-group rollup.
    *
    * Exactness: range rates are compared as num/den fractions through
    * one correctly-rounded double division (identical bits on both
    * engines) with total (k / j) tie-breaks, so both engines select the
    * same realizing range even at double-equal ties; rational-equal
    * ties are harmless by construction (equal rationals floor-divide to
    * the same nano-units). A distinct-rational double-equal collision
    * would need agreeing 53-bit significands across ~10⁷-scale
    * numerators — not reachable by the fixture and pinned brutally in
    * Extra26Spec against an exact-BigInt PAVA reference.
    */
  private[graft] def reliabilityOf(e: DataFrame): DataFrame = {
    val b = e.groupBy(least(expr("cu div 100000000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum("pos").as("np"))
    // Prefix sums over the ≤10 present bins (collapsed bounded domain —
    // the single-partition exchange here moves ≤10 rows).
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = b.select(col("bin"), col("n"), col("np"),
      sum("n").over(w).as("sn"), sum("np").over(w).as("sp"))
    // All bin ranges [j, k]: pooled num/den via inclusive-prefix diffs.
    val pr = p.as("j").join(p.as("k"), col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("j"), col("k.bin").as("k"),
        (col("k.sp") - col("j.sp") + col("j.np")).as("num"),
        (col("k.sn") - col("j.sn") + col("j.n")).as("den"))
    val frac = col("num").cast("double") / col("den")
    // min over k ≥ i per (i, j), then max over j ≤ i per i.
    val t = b.select(col("bin").as("i"))
      .join(pr, col("j") <= col("i") && col("k") >= col("i"))
    val mn = t.withColumn("rn", row_number().over(
        Window.partitionBy("i", "j").orderBy(frac.asc, col("k").asc)))
      .filter(col("rn") === 1)
    val mx = mn.withColumn("rn2", row_number().over(
        Window.partitionBy("i").orderBy(frac.desc, col("j").asc)))
      .filter(col("rn2") === 1)
      .select(col("i").as("bin"),
        expr("(num * 1000000000) div den").as("fitted_units"))
    b.join(mx, "bin")
      .select(col("bin").cast("bigint").as("bin"), col("n"),
        col("np").as("n_pos"),
        expr("(np * 1000000000) div n").as("obs_units"),
        col("fitted_units"))
      .orderBy("bin")
  }

  val defs: Map[String, Q] = Map(

    // TIME TRAVEL: read the staged versioned table AS OF version 2 (of
    // 3 committed) and roll it up. The Spark side resolves manifest v2
    // — one driver-side read of a small file list, no data-dir listing
    // — and scans exactly those files; v3's files exist in the same
    // data directory and MUST stay invisible (that invisibility is the
    // whole point of manifest-based snapshots; LayoutSpec pins it with
    // an orphan-file probe). Oracle: v1∪v2 = keys ≡ 0,1 (mod 3).
    "table_snapshot" -> Q(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WHERE o_orderkey % 3 IN (0, 1)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val root = graft.ops.SnapshotTable.stage(s, d)
      graft.ops.SnapshotTable.readSnapshot(s, root, 2)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Q.dec2(sum(Q.dec2(col("o_totalprice")))).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    // INCREMENTAL REPROCESSING: exactly the rows ADDED between v1 and
    // v3 — the manifest set-diff (v2's and v3's ingest files), scanned
    // directly. This is the primitive a periodic 100 TB pipeline runs
    // every cycle ("process what arrived since my last checkpoint"):
    // cost scales with the NEW data, not the table — no anti-join
    // against the old snapshot, no full rescan. key_sum makes the gate
    // sensitive to any leaked v1 row or dropped v2/v3 row, not just
    // miscounts. Oracle: keys ≡ 1,2 (mod 3).
    "table_incremental" -> Q(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM read_parquet('{sfDir}/orders.parquet')
        |WHERE o_orderkey % 3 IN (1, 2)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val root = graft.ops.SnapshotTable.stage(s, d)
      graft.ops.SnapshotTable.readIncremental(s, root, 1, 3)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
        .orderBy("o_orderpriority")
    },

    // RELIABILITY DIAGRAM WITH ISOTONIC FIT — the calibration-curve
    // member of the eval family (ECE gives one number, Brier a proper
    // score; the reliability curve is what you LOOK at, and its
    // monotone PAVA fit is the Zadrozny–Elkan calibration map you then
    // apply to scores). Shares eval_calibration's fixture: confidence
    // = frac(value) quantized once to nano-units, outcome = purchase.
    // Emits per bin the observed rate and the isotonic fitted rate,
    // both in exact integer nano-units; the oracle states the same
    // min-max form over the same prefix sums.
    "eval_reliability" -> Q(
      """WITH e AS (
        |  SELECT CAST(FLOOR((value - FLOOR(value)) * 1000000000) AS BIGINT) AS cu,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM read_parquet('{sfDir}/events.parquet')),
        |b AS (SELECT LEAST(cu // 100000000, 9) AS bin,
        |             CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(pos) AS BIGINT) AS np
        |      FROM e GROUP BY 1),
        |p AS (SELECT bin, n, np,
        |             SUM(n) OVER (ORDER BY bin) AS sn,
        |             SUM(np) OVER (ORDER BY bin) AS sp
        |      FROM b),
        |pr AS (SELECT j.bin AS j, k.bin AS k,
        |              k.sp - j.sp + j.np AS num, k.sn - j.sn + j.n AS den
        |       FROM p j JOIN p k ON j.bin <= k.bin),
        |t AS (SELECT i.bin AS i, pr.j, pr.k, pr.num, pr.den
        |      FROM b i JOIN pr ON pr.j <= i.bin AND pr.k >= i.bin),
        |mn AS (SELECT i, j, num, den,
        |         ROW_NUMBER() OVER (PARTITION BY i, j
        |           ORDER BY CAST(num AS DOUBLE)/den ASC, k ASC) AS rn
        |       FROM t),
        |mx AS (SELECT i, num, den,
        |         ROW_NUMBER() OVER (PARTITION BY i
        |           ORDER BY CAST(num AS DOUBLE)/den DESC, j ASC) AS rn2
        |       FROM mn WHERE rn = 1)
        |SELECT CAST(b.bin AS BIGINT) AS bin, b.n, b.np AS n_pos,
        |  CAST((b.np * 1000000000) // b.n AS BIGINT) AS obs_units,
        |  CAST((mx.num * 1000000000) // mx.den AS BIGINT) AS fitted_units
        |FROM b JOIN mx ON b.bin = mx.i WHERE mx.rn2 = 1
        |ORDER BY bin""".stripMargin) { (s, d) =>
      reliabilityOf(T.events(s, d).select(
        floor((col("value") - floor(col("value"))) * lit(1000000000.0))
          .cast("bigint").as("cu"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos")))
    }
  )
}
