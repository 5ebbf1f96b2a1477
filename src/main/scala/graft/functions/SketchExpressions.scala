package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch kernels (SURVEY §2.10/§4): the per-element loops that
  * are hot spots as interpreted SQL lambdas (k×n and 64×n folds) run
  * here as compiled JVM loops. Constants are fixed, so results are
  * deterministic and identical across partitionings.
  *
  * CodegenFallback is deliberate: the loops are already compiled Scala;
  * fusing them into whole-stage codegen buys little next to the
  * lambda-interpreter overhead they remove.
  */
object SketchConstants {
  val P = 2147483647L // 2^31-1, Mersenne prime
  def perm(i: Int): (Long, Long) =
    ((2L * i + 1L) * 2654435761L % P, (i * 40503L + 2699L) % P)

  /** splitmix64 — deterministic hyperplane components in [-1, 1). */
  def mix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def hyperplane(table: Int, plane: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      (mix(table.toLong << 40 | plane.toLong << 20 | i.toLong) % 1000000L) / 1000000.0
    }
}

/** 64-bit SimHash over an array<long> of element hashes. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 needs array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 63
    while (b >= 0) { out = (out << 1) | (if (counters(b) >= 0) 1L else 0L); b -= 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** MinHash signature (k permutations over P) of an array<long> of
  * pre-reduced shingle hashes.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  import SketchConstants._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature needs array<bigint>, got ${t.simpleString}")
  }

  private lazy val as: Array[Long] = Array.tabulate(k)(perm(_)._1)
  private lazy val bs: Array[Long] = Array.tabulate(k)(perm(_)._2)

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(P)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val x = (as(j) * h + bs(j)) % P
        val xm = if (x < 0) x + P else x
        if (xm < sig(j)) sig(j) = xm
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sign-LSH bucket ids for `tables` independent hash tables of `nbits`
  * hyperplanes each, over an array<float> embedding. Output array<long>
  * of length `tables` (bucket of table t at position t).
  */
case class SignLshBuckets(child: Expression, nbits: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {
  import SketchConstants._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sign_lsh_buckets needs array<float>, got ${t.simpleString}")
  }

  // dim-lazy hyperplane cache: built on first row, per (table, plane).
  @transient private lazy val planes =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def planesFor(dim: Int): Array[Array[Double]] =
    planes.computeIfAbsent(dim, _ =>
      Array.tabulate(tables * nbits)(p => hyperplane(p / nbits, p % nbits, dim)))

  override def nullSafeEval(v: Any): Any = {
    val emb = v.asInstanceOf[ArrayData]
    val dim = emb.numElements()
    val hp = planesFor(dim)
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) { x(i) = emb.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nbits) {
        val h = hp(t * nbits + b)
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += x(j) * h(j); j += 1 }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
