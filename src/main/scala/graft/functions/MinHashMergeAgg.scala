package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Element-wise-min merge of MinHash signatures as a typed `Aggregator`
  * (the [[CountMinAgg]]/[[WeightedAvg]] ladder rung applied to the
  * defining mergeability of MinHash): sig(A ∪ B) = min(sig(A), sig(B))
  * position-wise, so folding per-document signatures under this
  * aggregate yields exactly the signature of the group's shingle UNION.
  *
  * Scale story — the reason this is an Aggregator and not a
  * posexplode + groupBy(key, position) rollup or a collect_list fold:
  * partial buffers are one k-long array per (group × partition),
  * merged map-side (order-independent elementwise min), so a source
  * with a billion documents still moves only `partitions × k` longs
  * through the shuffle and never materializes a per-group row list.
  * (The measured local motivation was the same shape: the explode-based
  * rollup paid ~1 s of Generate overhead on 640k (position, value)
  * rows that this fold never creates.)
  *
  * The empty-array zero stands for "no documents yet" (positive-
  * infinity signature); reduce/merge clone before mutating only when
  * adopting the other side's buffer, and mutate in place otherwise —
  * the standard Aggregator buffer-reuse contract.
  */
object MinHashMergeAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] =
    if (buf.isEmpty) sig.clone()
    else {
      var i = 0
      while (i < buf.length) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
