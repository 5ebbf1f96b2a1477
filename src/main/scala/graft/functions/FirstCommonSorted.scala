package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** First element common to two SORTED bigint arrays — the native
  * codegen'd replacement for `array_min(array_intersect(a, b))` on the
  * exactly-once minimal-shared-cell emission filter
  * ([[graft.ops.IvfIndex]]): a pair probing overlapping cell sets must
  * be emitted from exactly one shared cell, and "the smallest" is the
  * canonical pick. The SQL form allocates an intersection array and a
  * null-tracking hash set per ROW; at IVF candidate volumes (~3M joined
  * rows at sf0.1 under the ground-truth gate) that one filter was
  * measured at 0.7 s of the query's 1.6 s warm cost (local[4],
  * IvfWarmProbe r11). This kernel is the classic sorted-merge
  * two-pointer scan — no allocation, early exit on the first hit, and
  * it stays inside whole-stage codegen.
  *
  * PRECONDITION (the caller's contract; the non-null half is enforced
  * with a named error when the input type admits nulls — ADVICE r11,
  * see the guard below): both arrays are
  * sorted ascending with non-null elements — exactly what
  * `sort_array(collect_list(...))` over non-null keys produces. On
  * sorted inputs the first common element IS the minimum of the
  * intersection, so the replacement is semantics-preserving
  * (FirstCommonSortedSpec pins equivalence against the SQL form on
  * randomized sorted inputs, plus the no-overlap null case).
  *
  * Returns null when the arrays share no element (the SQL form's
  * array_min(empty) is null too); inside an equality filter a null
  * compares to false, dropping the row — identical behavior.
  */
case class FirstCommonSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "first_common_sorted"

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

  // Null-element guard (ADVICE r11): getLong on a null slot silently
  // reads 0, which could MATCH and emit a wrong minimal key. Enforced
  // only when the input TYPE admits null elements — the shipped call
  // sites build cells via sort_array(collect_list(..)) whose type is
  // containsNull=false, so they compile the guard out entirely.
  private def leftMayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private def rightMayHaveNullElems: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull
  private def nullElemError(): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: null array element — inputs must be sorted arrays " +
        "of non-null bigints (the sort_array(collect_list(..)) contract)")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val gx = leftMayHaveNullElems; val gy = rightMayHaveNullElems
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0
    while (i < nx && j < ny) {
      if (gx && x.isNullAt(i)) nullElemError()
      if (gy && y.isNullAt(j)) nullElemError()
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) return xi
      else if (xi < yj) i += 1
      else j += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val err = "\"first_common_sorted: null array element — inputs " +
        "must be sorted arrays of non-null bigints\""
      val guardX = if (leftMayHaveNullElems)
        s"if ($x.isNullAt($i)) throw new IllegalArgumentException($err);" else ""
      val guardY = if (rightMayHaveNullElems)
        s"if ($y.isNullAt($j)) throw new IllegalArgumentException($err);" else ""
      // nullSafeCodeGen pre-sets ev.isNull = false once both inputs are
      // non-null; re-raise it unless the scan finds a common element.
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0, $j = 0;
         |${ev.isNull} = true;
         |while ($i < $nx && $j < $ny) {
         |  $guardX
         |  $guardY
         |  long $xi = $x.getLong($i);
         |  long $yj = $y.getLong($j);
         |  if ($xi == $yj) { ${ev.isNull} = false; ${ev.value} = $xi; break; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
