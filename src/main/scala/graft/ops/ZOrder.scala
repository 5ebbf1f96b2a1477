package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the standard multi-dimensional data
  * layout technique (Delta/Iceberg `OPTIMIZE ZORDER BY`, public since
  * Morton 1966): interleaving the bits of two dimension keys produces a
  * ONE-dimensional sort key whose ranges bound BOTH dimensions, so
  * range-partitioned / row-group-sorted parquet prunes on either filter
  * column. A linear sort only ever bounds its leading column; at 100 TB
  * the difference is "scan 4% of files" vs "scan all of them" for any
  * predicate on the second column.
  *
  * Everything here is pure integer arithmetic on codegen'd built-ins —
  * no UDFs, deterministic, and exactly replayable in the DuckDB oracle
  * (bit shifts + masks are engine-independent).
  *
  * Scale shape: the min/max frame used for normalization is one tiny
  * global aggregate (broadcast, 1 row); the key itself is map-side; the
  * layout write is `repartitionByRange(zkey)` — one range shuffle, the
  * same cost any sorted write pays, after which EVERY future scan of the
  * table gets two-column pruning for free. LayoutSpec measures the
  * effect on real parquet footers (files matched by a 2-D box predicate
  * under z-order vs linear layout).
  */
object ZOrder {

  /** Interleave the low 16 bits of `xi` (even positions) and `yi` (odd
    * positions) into a 32-bit Morton key. Contract: inputs are in
    * 0..65535 — [[withZKey]]'s normalization guarantees it; callers
    * feeding raw keys must mask first. The loop is unrolled at plan
    * build — 16 constant-shift terms per dimension, all inside
    * whole-stage codegen (shift amounts must be literals for the
    * built-in `shiftright`; a lambda over `sequence(0,15)` would make
    * them columns).
    */
  def interleave16(xi: Column, yi: Column): Column =
    (0 until 16).map { b =>
      shiftleft(shiftright(xi, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(yi, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** `df` + a `zkey` column over dimension columns `x`, `y`: each
    * dimension min/max-normalized to the 16-bit grid (integer floor
    * division — overflow-safe while (max-min)·65535 fits int64, i.e.
    * any real key domain), then bit-interleaved. The 1-row stats frame
    * rides a broadcast; constant columns normalize to 0 (the
    * `greatest(span, 1)` guard).
    */
  def withZKey(df: DataFrame, x: String, y: String): DataFrame = {
    val stats = df.agg(
      min(col(x)).cast("long").as("minx"), max(col(x)).cast("long").as("maxx"),
      min(col(y)).cast("long").as("miny"), max(col(y)).cast("long").as("maxy"))
    df.crossJoin(broadcast(stats))
      .withColumn("xi", expr(
        s"(($x - minx) * 65535L) div greatest(maxx - minx, 1L)"))
      .withColumn("yi", expr(
        s"(($y - miny) * 65535L) div greatest(maxy - miny, 1L)"))
      .withColumn("zkey", interleave16(col("xi"), col("yi")))
      .drop("minx", "maxx", "miny", "maxy", "xi", "yi")
  }
}
