package graft.queries

import graft.Q
import org.apache.spark.sql.functions._

/** Round-16 additions (VERDICT r15 task list):
  *
  *   - `table_snapshot` / `table_incremental`: the native snapshot /
  *     time-travel table family over `ops/SnapshotTable` — the one
  *     operating model the board did not yet declare (VERDICT r15 #2).
  *
  * Determinism contracts as established: integer/decimal arithmetic,
  * total output orders, no rand(), no UDFs. The snapshot store derives
  * version v from `o_orderkey % 3 == v-1`, so DuckDB replays any
  * snapshot/diff over the ORIGINAL parquet with the same modulo filter —
  * the gate proves the manifest machinery is lossless (loses no rows,
  * leaks no uncommitted ones).
  */
object Extra26 {

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
    }
  )
}
