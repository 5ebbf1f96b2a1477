package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Count-min frequency sketch as a typed `Aggregator` (registered via
  * `udaf()` — the same partial+final custom-aggregate ladder rung as
  * [[WeightedAvg]]): `depth` hash rows × `width` counters, one flat
  * Long array buffer. Input is the item's xxhash64 (computed by the
  * engine-side `xxhash64()` SQL function so probes can re-derive the
  * same rows in pure SQL — see [[estimateSql]]).
  *
  * Scale story: the whole corpus folds into ONE 8 KB array — partial
  * buffers merge by elementwise integer addition (order-independent,
  * exact, map-side combinable), the final sketch broadcasts, and point
  * estimates are `depth` array lookups inside codegen'd expressions.
  * The estimate is always ≥ the true count (counters only over-count)
  * and over-counts by more than εN only with the classic CM failure
  * probability; the declared gate (`agg_countmin`) checks both sides.
  */
object CountMinAgg extends Aggregator[Long, Array[Long], Array[Long]] {

  val width = 256 // power of two: the row index is the multiplied hash's top 8 bits
  val depth = 4

  /** The i-th row index is the i-th 8-bit slice of the 64-bit xxhash —
    * disjoint bit ranges of one high-quality hash as the d row
    * functions. Chosen over the classic per-row multiply because it is
    * replayable in ANSI-mode SQL (`shiftrightunsigned` + `&` — a wrapped
    * `h * mult` raises ARITHMETIC_OVERFLOW under Spark 4's defaults).
    */
  private def idx(h: Long, i: Int): Int =
    (i * width) + ((h >>> (56 - 8 * i)) & 0xFFL).toInt

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < depth) { buf(idx(h, i)) += 1L; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  /** SQL expression estimating the count of `itemCol` from a sketch
    * column `bufCol`: min over rows of the addressed counter — pure
    * codegen'd arithmetic + element_at, no UDF on the probe side.
    */
  def estimateSql(bufCol: String, itemCol: String): String =
    (0 until depth).map { i =>
      s"element_at($bufCol, ${i * width} + " +
        s"CAST(shiftrightunsigned(xxhash64($itemCol), ${56 - 8 * i}) & 255 AS INT) + 1)"
    }.mkString("least(", ", ", ")")
}
