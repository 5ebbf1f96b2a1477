package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| of two SORTED duplicate-free bigint arrays — the native
  * codegen'd replacement for `size(array_intersect(a, b))` on the
  * exact-overlap verify stages of the dedup family
  * ([[graft.ops.Sketches.minhashNearDups]], the containment verify in
  * `queries/Extra9`, [[graft.ops.IncrementalDedup]]): every LSH/prefix
  * candidate pair pays one exact intersection over two document-sized
  * gram arrays, and the SQL form builds a hash set plus a result array
  * per ROW — measured at ~1.1 s of dedup_containment's 1.9 s at sf0.1
  * (ContainProbe r11, 300k candidates × ~52-gram arrays, local[4]).
  * This kernel is the sorted-merge two-pointer count: no allocation,
  * and it stays inside whole-stage codegen. Same family as
  * [[FirstCommonSorted]]; kept separate because the fused count loop
  * and the early-exit first-hit loop share nothing worth abstracting.
  *
  * PRECONDITION (caller's contract): both arrays sorted ascending,
  * elements non-null and duplicate-free — what
  * `sort_array(array_distinct(...))` produces. Under it the count
  * equals the SQL form exactly (set semantics; GraftProperties +
  * SketchesSpec pin equivalence on generated and DataFrame-scale
  * inputs, interpreted and codegen paths). The non-null part is
  * ENFORCED, not assumed: getLong on a null slot silently reads 0, so
  * a null element would corrupt the count rather than fail (ADVICE
  * r11). When the input TYPE already proves containsNull=false (e.g.
  * sort_array(collect_list(..))) the guard is compiled out entirely;
  * only the lambda-built shingle paths — whose transform() output is
  * containsNull=true at the type level though never null in fact —
  * pay one bitmap probe per element advance (~15M probes across
  * dedup_minhash's 300k candidates: sub-ms, unmeasurable).
  */
case class IntersectSizeSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size_sorted"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // The guard is needed only when the TYPE admits null elements; when
  // the input proves containsNull=false it costs literally nothing
  // (compiled out of codegen, skipped in the interpreted loop).
  private def leftMayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private def rightMayHaveNullElems: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull
  private def nullElemError(): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: null array element — inputs must be sorted arrays " +
        "of non-null bigints (the sort_array(array_distinct(..)) contract)")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val gx = leftMayHaveNullElems; val gy = rightMayHaveNullElems
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      if (gx && x.isNullAt(i)) nullElemError()
      if (gy && y.isNullAt(j)) nullElemError()
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val err = "\"intersect_size_sorted: null array element — inputs " +
        "must be sorted arrays of non-null bigints\""
      val guardX = if (leftMayHaveNullElems)
        s"if ($x.isNullAt($i)) throw new IllegalArgumentException($err);" else ""
      val guardY = if (rightMayHaveNullElems)
        s"if ($y.isNullAt($j)) throw new IllegalArgumentException($err);" else ""
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  $guardX
         |  $guardY
         |  long $xi = $x.getLong($i);
         |  long $yj = $y.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
