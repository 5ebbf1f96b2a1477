package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Automatic bloom-filtered join (SURVEY §4's candidate custom Rule; the
  * declared `join_bloom` query is the hand-built form of the same plan).
  *
  * Rewrites an eligible equi-join so the probe side is pre-filtered by a
  * bloom filter built once over the (small, selectively filtered) build
  * side's join keys:
  *
  * {{{
  *   Join(probe, dim, Inner, probeKey = dimKey)
  *     ⇒ Join(Filter(might_contain(scalar-subquery(bloom(dim.keys)),
  *                                 xxhash64(probeKey)),
  *                   probe),
  *            dim, Inner, …)
  * }}}
  *
  * The bloom aggregate is a scalar subquery — executed once, its
  * kilobyte-sized result broadcast into the probe filter — and the probe
  * rows that cannot match are dropped BEFORE the join's exchange. At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~selectivity fraction that can survive the join;
  * false positives are removed by the exact join that still runs above.
  * The rewrite is result-invisible by construction (bloom filters have no
  * false negatives), mirroring Spark's own runtime-filter framework but
  * as an explicitly injectable engine rule with its own eligibility gates.
  *
  * Eligibility (all conf-gated, `spark.graft.bloomJoin.*`):
  *   - Inner join (either side can build) or LEFT SEMI (right side builds);
  *   - the build side carries a selective `Filter` and its size estimate
  *     is ≤ `maxBuildSize` (the bloom build must be cheap);
  *   - the probe side's size estimate is ≥ `minProbeSize` (filtering a
  *     small probe is overhead) and ≥ the build side's;
  *   - the probe side does not already carry a bloom probe filter
  *     (idempotence under fixed-point batches and repeated optimization).
  *
  * Injected once per optimization via `injectPreCBORule` (after the
  * operator-optimization fixed point, so pushdowns have settled and the
  * size estimates are final; before physical planning, so the inserted
  * Filter itself still participates in scan pushdown placement).
  */
case class BloomJoinRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private def flag(key: String, dflt: String): String =
    conf.getConfString(s"spark.graft.bloomJoin.$key", dflt)

  private def enabled        = flag("enabled", "false").toBoolean
  private def maxBuildBytes  = flag("maxBuildSize", (16L << 20).toString).toLong
  private def minProbeBytes  = flag("minProbeSize", (64L << 20).toString).toLong
  private def expectedItems  = flag("expectedItems", "1000000").toLong
  private def numBits        = flag("numBits", (8L << 20).toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j: Join => rewrite(j).getOrElse(j)
    }

  /** A side qualifies as the bloom BUILD side if something makes it
    * selective (a real Filter survived optimization — IsNotNull conjuncts
    * don't count: the optimizer adds those to every equi-join key, they
    * say nothing about selectivity) and it is small enough that one extra
    * aggregate over it is cheap.
    */
  private def canBuild(p: LogicalPlan): Boolean =
    p.stats.sizeInBytes <= maxBuildBytes && p.exists {
      case Filter(c, _) if !hasBloomProbe(c) =>
        splitConjunctivePredicates(c).exists {
          case _: IsNotNull => false
          case _ => true
        }
      case _ => false
    }

  private def hasBloomProbe(e: Expression): Boolean =
    e.exists(_.isInstanceOf[BloomFilterMightContain])

  /** Idempotence gate: a probe side already pre-filtered by a bloom probe
    * (ours or Spark's runtime filter) is never filtered again.
    */
  private def canProbe(p: LogicalPlan, buildSize: BigInt): Boolean =
    p.stats.sizeInBytes >= minProbeBytes && p.stats.sizeInBytes >= buildSize &&
      !p.exists {
        case Filter(c, _) => hasBloomProbe(c)
        case _ => false
      }

  private def rewrite(j: Join): Option[Join] = {
    val equiKeys = j.condition.toSeq.flatMap(splitConjunctivePredicates).collect {
      case EqualTo(l, r) if l.references.subsetOf(j.left.outputSet) &&
          r.references.subsetOf(j.right.outputSet) && l.deterministic &&
          r.deterministic => (l, r)
      case EqualTo(l, r) if l.references.subsetOf(j.right.outputSet) &&
          r.references.subsetOf(j.left.outputSet) && l.deterministic &&
          r.deterministic => (r, l) // normalized to (leftKey, rightKey)
    }
    equiKeys.headOption.flatMap { case (leftKey, rightKey) =>
      j.joinType match {
        // Inner: whichever side qualifies builds; prefer the smaller one.
        case Inner =>
          val rightBuilds = canBuild(j.right) && canProbe(j.left, j.right.stats.sizeInBytes)
          val leftBuilds  = canBuild(j.left) && canProbe(j.right, j.left.stats.sizeInBytes)
          if (rightBuilds && (!leftBuilds ||
              j.right.stats.sizeInBytes <= j.left.stats.sizeInBytes))
            Some(j.copy(left = probeFilter(j.left, leftKey, j.right, rightKey)))
          else if (leftBuilds)
            Some(j.copy(right = probeFilter(j.right, rightKey, j.left, leftKey)))
          else None
        // LEFT SEMI is itself a filter — only the right side may build.
        case LeftSemi
            if canBuild(j.right) && canProbe(j.left, j.right.stats.sizeInBytes) =>
          Some(j.copy(left = probeFilter(j.left, leftKey, j.right, rightKey)))
        case _ => None
      }
    }
  }

  /** `Filter(might_contain(scalar-subquery(bloom(build.keys)), xxhash64(probeKey)), probe)` */
  private def probeFilter(probe: LogicalPlan, probeKey: Expression,
      build: LogicalPlan, buildKey: Expression): Filter = {
    val agg = Aggregate(Nil,
      Seq(Alias(new BloomFilterAggregate(new XxHash64(Seq(buildKey)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression(),
        "graft_bloom")()),
      // Prune the build side to the key before aggregating — the subquery
      // is planned standalone, so hand it the narrow projection directly.
      Project(buildKey.references.toSeq, build))
    Filter(BloomFilterMightContain(ScalarSubquery(agg),
      new XxHash64(Seq(probeKey))), probe)
  }
}
