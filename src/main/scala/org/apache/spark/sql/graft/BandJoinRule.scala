package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegralType, LongType, NumericType}

/** Automatic band join (the second injected engine Rule next to
  * [[BloomJoinRule]]; the declared `join_band` query is the hand-built
  * form of the same plan).
  *
  * A join whose ONLY cross-side condition is a band predicate
  * `abs(l − r) <= ε` has no equi-key, so Spark must plan a nested-loop /
  * cartesian — the O(n·m) shape that dies at scale. This rule
  * manufactures the equi-key: bucket both sides by `floor(value / ε)`,
  * explode the SMALLER side to its {−1, 0, +1} neighbor buckets, and
  * join on bucket equality with the original band predicate kept as the
  * exact residual:
  *
  * {{{
  *   Join(big, small, Inner, abs(bigV − smallV) <= ε)
  *     ⇒ Project(original output,
  *         Join(big,
  *              Generate(explode(array(bk−1, bk, bk+1)), small),
  *              Inner,
  *              floor(bigV / ε) = bucket AND abs(bigV − smallV) <= ε))
  * }}}
  *
  * |x − y| ≤ ε ⟹ floor(x/ε) − floor(y/ε) ∈ {−1, 0, 1}, so the bucket
  * join admits a superset of the band and the kept predicate is exact —
  * result-invisible by construction. Bucket arithmetic is TYPE-DRIVEN
  * to keep that claim provable: integral columns with an integral ε use
  * exact long floor division (no precision cliff at epoch-microsecond
  * magnitudes); float/double columns use the double quotient, whose ±1
  * cover is sound while |value|/ε < 2⁵² exactly — in the grey zone
  * |value|/ε ∈ [2⁵², 2⁵³) the fp floor can err by MORE than one bucket
  * (matching rows silently dropped) even though value spacing there
  * (ulp ≤ 2ε) still leaves the band predicate itself discriminating;
  * only past 2⁵³ is the comparison degenerate too. Decimal columns and
  * integral
  * columns under a fractional ε are DECLINED rather than risked. At
  * 100 TB the rewrite turns an O(n·m) comparison into a hash join with
  * 3× replication of the small side only — the same trade the
  * hand-built `join_band` makes.
  *
  * Eligibility (conf-gated, `spark.graft.bandJoin.*`):
  *   - Inner join whose condition has NO cross-side equality conjunct
  *     (with one, Spark already hash-joins — and the rewrite's own
  *     equality makes the rule idempotent under fixed-point batches);
  *   - a conjunct of shape `abs(a − b) <= ε` / `< ε` (either argument
  *     order, either comparison direction) with `a`, `b` deterministic,
  *     referencing opposite sides, both integral (with integral ε) or
  *     both float/double, ε a positive finite numeric literal;
  *   - the exploded side's size estimate is ≤ `maxExplodeSize` (the 3×
  *     replication must be affordable).
  */
case class BandJoinRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def flag(key: String, dflt: String): String =
    conf.getConfString(s"spark.graft.bandJoin.$key", dflt)

  private def enabled         = flag("enabled", "false").toBoolean
  private def maxExplodeBytes = flag("maxExplodeSize", (256L << 20).toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j: Join => rewrite(j).getOrElse(j)
    }

  /** Literal ε as a positive finite double, if the literal is numeric. */
  private def epsOf(l: Literal): Option[Double] = l.dataType match {
    case _: NumericType if l.value != null =>
      Cast(l, DoubleType).eval(null) match {
        case d: java.lang.Double if d > 0 && java.lang.Double.isFinite(d) =>
          Some(d)
        case _ => None
      }
    case _ => None
  }

  /** Matches `abs(a − b) <= ε` in any spelling; yields (a, b, ε). */
  private object BandPred {
    def unapply(e: Expression): Option[(Expression, Expression, Double)] = {
      def abs(x: Expression): Option[(Expression, Expression)] = x match {
        case Abs(Subtract(a, b, _), _) => Some((a, b))
        case _ => None
      }
      e match {
        case LessThanOrEqual(x, l: Literal) =>
          abs(x).flatMap { case (a, b) => epsOf(l).map((a, b, _)) }
        case LessThan(x, l: Literal) =>
          abs(x).flatMap { case (a, b) => epsOf(l).map((a, b, _)) }
        case GreaterThanOrEqual(l: Literal, x) =>
          abs(x).flatMap { case (a, b) => epsOf(l).map((a, b, _)) }
        case GreaterThan(l: Literal, x) =>
          abs(x).flatMap { case (a, b) => epsOf(l).map((a, b, _)) }
        case _ => None
      }
    }
  }

  /** Fractional-input bucket: floor of the double quotient. Sound while
    * |value|/ε ≪ 2⁵² (see class doc) — which is why this path is gated
    * to float/double inputs, where a band comparison beyond that
    * magnitude is itself meaningless.
    */
  private def bucketDouble(e: Expression, eps: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(eps)))

  /** Integral-input bucket: EXACT floor division in long arithmetic —
    * (x − pmod(x, ε)) div ε (pmod's non-negative remainder turns the
    * truncating div into a true floor for negatives). No rounding at
    * any magnitude, so the {−1, 0, +1} cover is exact where the double
    * path's soundness bound would not hold (e.g. epoch-microsecond
    * columns).
    */
  private def bucketLong(e: Expression, epsL: Long): Expression = {
    val x = Cast(e, LongType)
    IntegralDivide(Subtract(x, Pmod(x, Literal(epsL))), Literal(epsL))
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner || j.condition.isEmpty) return None
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    // With a cross-side equality Spark already plans a hash join — and
    // the rewrite's own manufactured equality lands here, making the
    // rule a no-op on its own output (fixed-point safe).
    def crossSide(l: Expression, r: Expression): Boolean =
      (l.references.nonEmpty && r.references.nonEmpty) &&
        ((l.references.subsetOf(j.left.outputSet) &&
          r.references.subsetOf(j.right.outputSet)) ||
         (l.references.subsetOf(j.right.outputSet) &&
          r.references.subsetOf(j.left.outputSet)))
    val hasEqui = conjuncts.exists {
      case EqualTo(l, r)       => crossSide(l, r)
      case EqualNullSafe(l, r) => crossSide(l, r)
      case _ => false
    }
    if (hasEqui) return None
    // First band conjunct whose sides are numeric, deterministic, and
    // reference opposite join sides (normalized to (leftExpr, rightExpr)).
    val band = conjuncts.collectFirst(Function.unlift {
      case BandPred(a, b, eps)
          if a.dataType.isInstanceOf[NumericType] &&
            b.dataType.isInstanceOf[NumericType] &&
            a.deterministic && b.deterministic =>
        if (a.references.nonEmpty && b.references.nonEmpty &&
            a.references.subsetOf(j.left.outputSet) &&
            b.references.subsetOf(j.right.outputSet)) Some((a, b, eps))
        else if (a.references.nonEmpty && b.references.nonEmpty &&
            a.references.subsetOf(j.right.outputSet) &&
            b.references.subsetOf(j.left.outputSet)) Some((b, a, eps))
        else None
      case _ => None
    })
    band.flatMap { case (leftExpr, rightExpr, eps) =>
      // Type-driven bucket arithmetic: integral inputs with an integral
      // ε get the EXACT long floor-div (no precision cliff at epoch
      // magnitudes); float/double inputs get the double quotient (sound
      // within the documented bound). Anything else — decimals, or
      // integral columns under a fractional ε — is declined rather than
      // risked: the rewrite must be provably result-invisible.
      val integral = leftExpr.dataType.isInstanceOf[IntegralType] &&
        rightExpr.dataType.isInstanceOf[IntegralType]
      val fractional =
        (leftExpr.dataType == DoubleType || leftExpr.dataType == FloatType) &&
        (rightExpr.dataType == DoubleType || rightExpr.dataType == FloatType)
      val bucketOf: Option[Expression => Expression] =
        if (integral && eps >= 1 && eps == math.floor(eps) && eps <= Long.MaxValue.toDouble)
          Some(bucketLong(_, eps.toLong))
        else if (fractional) Some(bucketDouble(_, eps))
        else None
      val explodeRight = j.right.stats.sizeInBytes <= j.left.stats.sizeInBytes
      val (small, smallExpr, bigExpr) =
        if (explodeRight) (j.right, rightExpr, leftExpr)
        else (j.left, leftExpr, rightExpr)
      if (small.stats.sizeInBytes > maxExplodeBytes || bucketOf.isEmpty) None
      else {
        val bucket = bucketOf.get
        val bk = bucket(smallExpr)
        val gen = Explode(CreateArray(Seq(
          Subtract(bk, Literal(1L)), bk, Add(bk, Literal(1L)))))
        val bkAttr = AttributeReference("graft_band_bucket", LongType)()
        val exploded = Generate(gen, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bkAttr), child = small)
        val newCond = And(j.condition.get, EqualTo(bucket(bigExpr), bkAttr))
        val newJoin =
          if (explodeRight) j.copy(right = exploded, condition = Some(newCond))
          else j.copy(left = exploded, condition = Some(newCond))
        Some(Project(j.output, newJoin))
      }
    }
  }
}
