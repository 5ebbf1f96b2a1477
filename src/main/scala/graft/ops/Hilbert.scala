package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering key — the space-filling curve with strictly
  * better locality than Z-order (Morton): consecutive Hilbert indexes
  * are ALWAYS grid-adjacent (unit Manhattan step, pinned in
  * HilbertSpec), whereas the Morton curve takes long diagonal jumps at
  * every power-of-two boundary. For a range-partitioned layout that
  * means each file's key range maps to a more compact 2-D box, so a
  * 2-D box predicate touches fewer files — which is why Delta moved
  * its OPTIMIZE clustering from Z-order to Hilbert. Public algorithm
  * (Hilbert 1891; bitwise form per the classic d2xy/xy2d formulation).
  *
  * Shape: the standard top-down bit recurrence — at each level take the
  * two leading bits (rx, ry), add the quadrant's size-s² offset in
  * curve order ((3·rx)^ry), then reflect+transpose the REMAINING low
  * bits into the sub-quadrant's frame. The loop is unrolled at plan
  * build into `bits` chained projections; each iteration materializes
  * its intermediates as named columns (NOT nested Column expressions —
  * reusing a Column twice per level would triple the expression tree
  * per level and the 16-level unroll would be 3^16 nodes deep; named
  * columns keep it linear and Catalyst keeps multiply-referenced,
  * non-cheap projections un-collapsed). Everything is integer
  * shift/mask/xor on codegen'd built-ins — no UDFs, exactly replayable
  * in DuckDB (the oracle replays the recurrence as a recursive CTE).
  *
  * Scale shape: identical to [[ZOrder]] — one broadcast 1-row min/max
  * frame for normalization, then map-side arithmetic; the layout write
  * is a single `repartitionByRange(hkey)`.
  */
object Hilbert {

  /** Append Hilbert index `out` of (`xi`, `yi`) on the 2^bits × 2^bits
    * grid, as UNROLLED built-in column arithmetic. Kept as the
    * spec-only cross-check against [[graft.functions.HilbertIndex]]
    * (the native expression the production path uses): two independent
    * formulations plus [[reference]] must all agree. NOT for hot paths —
    * the ~50 chained projections make plan analysis the dominant cost
    * (measured 4.9 s unrolled vs 0.56 s native on the sf0.1 bench
    * input; z-order 0.31-0.54 on the same runs). Contract: both
    * coordinates already in
    * [0, 2^bits). Working columns are prefixed `_h_` and dropped.
    */
  def withIndex(df0: DataFrame, xi: String, yi: String, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    var df = df0
      .withColumn("_h_x", col(xi).cast("long"))
      .withColumn("_h_y", col(yi).cast("long"))
      .withColumn(out, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val m = (1L << i) - 1
      df = df
        .withColumn("_h_rx", shiftright(col("_h_x"), i).bitwiseAND(lit(1L)))
        .withColumn("_h_ry", shiftright(col("_h_y"), i).bitwiseAND(lit(1L)))
        // this quadrant's offset along the curve: s² · ((3·rx) ^ ry)
        .withColumn(out,
          col(out) + shiftleft((col("_h_rx") * 3).bitwiseXOR(col("_h_ry")), 2 * i))
        .withColumn("_h_xl", col("_h_x").bitwiseAND(lit(m)))
        .withColumn("_h_yl", col("_h_y").bitwiseAND(lit(m)))
        // rotate the low bits into the sub-quadrant frame: when ry=0,
        // reflect (iff rx=1) then transpose; when ry=1, identity.
        .withColumn("_h_x2",
          when(col("_h_ry") === 0,
            when(col("_h_rx") === 1, lit(m) - col("_h_yl")).otherwise(col("_h_yl")))
            .otherwise(col("_h_xl")))
        .withColumn("_h_y2",
          when(col("_h_ry") === 0,
            when(col("_h_rx") === 1, lit(m) - col("_h_xl")).otherwise(col("_h_xl")))
            .otherwise(col("_h_yl")))
        .withColumn("_h_x", col("_h_x2"))
        .withColumn("_h_y", col("_h_y2"))
        .drop("_h_rx", "_h_ry", "_h_xl", "_h_yl", "_h_x2", "_h_y2")
    }
    df.drop("_h_x", "_h_y")
  }

  /** `df` + `hkey`: each dimension min/max-normalized to the 16-bit
    * grid (same recipe as [[ZOrder.withZKey]] so the two layouts are
    * directly comparable on the same data), then Hilbert-indexed.
    */
  def withHKey(df: DataFrame, x: String, y: String): DataFrame = {
    val stats = df.agg(
      min(col(x)).cast("long").as("minx"), max(col(x)).cast("long").as("maxx"),
      min(col(y)).cast("long").as("miny"), max(col(y)).cast("long").as("maxy"))
    df.crossJoin(broadcast(stats))
      .withColumn("xi16", expr(
        s"(($x - minx) * 65535L) div greatest(maxx - minx, 1L)"))
      .withColumn("yi16", expr(
        s"(($y - miny) * 65535L) div greatest(maxy - miny, 1L)"))
      .withColumn("hkey", org.apache.spark.sql.graft.native
        .hilbert_index(col("xi16"), col("yi16"), 16))
      .drop("minx", "maxx", "miny", "maxy", "xi16", "yi16")
  }

  /** Plain-Scala reference of the same recurrence — the spec's oracle
    * for bijectivity/adjacency on small grids and for sampled equality
    * with the column form.
    */
  def reference(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    for (i <- (bits - 1) to 0 by -1) {
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += ((3 * rx) ^ ry) << (2 * i)
      val m = (1L << i) - 1
      val xl = x & m; val yl = y & m
      if (ry == 0L) {
        if (rx == 1L) { x = m - yl; y = m - xl }
        else { x = yl; y = xl }
      } else { x = xl; y = yl }
    }
    d
  }
}
