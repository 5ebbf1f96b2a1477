package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd squared Euclidean distance over two bigint-array
  * columns: Σ (a_i − b_i)² as one fused integer loop — the
  * custom-`Expression` upgrade over the `aggregate(zip_with(...))`
  * lambda form (the [[CosineSimilarity]] precedent): higher-order
  * functions are CodegenFallback in Spark, so the lambda form pays
  * per-element interpreted dispatch plus an intermediate zipped-array
  * allocation per row — measured as the dominant cost of
  * eval_confusion's 20k-row × 64-dim distance pass (r16 optimization
  * round). Integer arithmetic is exact and order-free; callers own the
  * overflow envelope (micro-unit embeddings: |a_i − b_i| ≤ 2·10⁶, so
  * the 64-dim sum ≤ 2.6·10¹⁴ ≪ 2⁶³).
  *
  * Length contract: sums over the common prefix (min length) — callers
  * that must fail on ragged inputs keep their explicit size guard
  * (eval_confusion's raise_error), which this expression does not
  * duplicate.
  */
case class SquaredDistanceLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sq_dist_long"

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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val di = ctx.freshName("di")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $di = $x.getLong($i) - $y.getLong($i);
         |  $acc += $di * $di;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
