package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd Hilbert-curve index of (x, y) on the 2^bits-side
  * grid — the custom-`Expression` upgrade over [[graft.ops.Hilbert]]'s
  * unrolled-projection form. The unrolled form is algebraically
  * identical (HilbertSpec pins the equality) but costs ~50 chained
  * Project operators per plan: analysis alone dominates the query at
  * bench scale (measured 4.9 s vs z-order's 0.31 s on the same input —
  * the data work is trivial; the plan size is not). One expression with
  * a loop keeps the plan a single projection and the whole transform
  * inside one JIT-friendly generated method.
  *
  * The recurrence (public algorithm: Hilbert 1891, bitwise xy2d form):
  * per level take the leading bits (rx, ry), add the quadrant's s²
  * offset in curve order ((3·rx)^ry), reflect+transpose the remaining
  * low bits into the sub-quadrant frame. Contract: inputs in
  * [0, 2^bits); callers normalize first ([[graft.ops.Hilbert.withHKey]]).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits=$bits out of range")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += ((3L * rx) ^ ry) << (2 * i)
      val m = (1L << i) - 1L
      val xl = x & m; val yl = y & m
      if (ry == 0L) {
        if (rx == 1L) { x = m - yl; y = m - xl }
        else { x = yl; y = xl }
      } else { x = xl; y = yl }
      i -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val hx = ctx.freshName("hx"); val hy = ctx.freshName("hy")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val m = ctx.freshName("m")
      val xl = ctx.freshName("xl"); val yl = ctx.freshName("yl")
      s"""
         |long $hx = $a; long $hy = $b; long $d = 0L;
         |for (int $i = $bits - 1; $i >= 0; $i--) {
         |  long $rx = ($hx >> $i) & 1L;
         |  long $ry = ($hy >> $i) & 1L;
         |  $d += ((3L * $rx) ^ $ry) << (2 * $i);
         |  long $m = (1L << $i) - 1L;
         |  long $xl = $hx & $m; long $yl = $hy & $m;
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $hx = $m - $yl; $hy = $m - $xl; }
         |    else { $hx = $yl; $hy = $xl; }
         |  } else { $hx = $xl; $hy = $yl; }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
