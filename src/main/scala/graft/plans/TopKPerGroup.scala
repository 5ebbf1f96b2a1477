package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY §4, the (c) rung of the custom-op
  * ladder): top-k rows per group as a first-class plan node.
  *
  * Why not the window form? `ROW_NUMBER() OVER (PARTITION BY g ORDER BY
  * v) <= k` must SORT every partition in full — O(n log n) compute and
  * O(partition) memory/spill — to then throw away all but k rows. This
  * operator clusters by the group key and keeps a bounded heap of k rows
  * per group: O(n log k), memory bounded by groups×k rows regardless of
  * input size — the shape you want when n is 100 TB and k is 3.
  *
  * The caller must supply a TOTAL ordering (unique tie-break) for
  * deterministic results — same contract as every declared query.
  */
final case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Co-locate each group on one partition; the planner inserts the hash
    * exchange (and AQE can still coalesce it).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val groupE = groupExprs
    val orderE = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord = GenerateOrdering.generate(orderE, childOutput)
      // Max-heap w.r.t. the rank ordering: head = currently-worst kept
      // row, so replacement is O(log k).
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = new mutable.PriorityQueue[InternalRow]()(ord)
            h += row.copy()
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < kk) h += row.copy()
            else if (ord.compare(row, h.head) < 0) { h.dequeue(); h += row.copy() }
        }
      }
      // Emit each group's survivors in rank order (k is small; the
      // declared queries re-order globally anyway).
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner rule: one-to-one lowering of the logical node. Attach with
  * `spark.experimental.extraStrategies` (the bridge does this lazily) or
  * via `GraftExtensions.injectPlannerStrategy`.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
