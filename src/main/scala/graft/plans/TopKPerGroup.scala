package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{StructField, StructType}

/** Whole-operator extension (SURVEY §4, the (c) rung of the custom-op
  * ladder): top-k rows per group as a first-class plan node.
  *
  * Why not the window form? `ROW_NUMBER() OVER (PARTITION BY g ORDER BY
  * v) <= k` must SORT every partition in full — O(n log n) compute and
  * O(partition) memory/spill — to then throw away all but k rows. This
  * operator clusters by the group key and keeps a bounded heap of k rows
  * per group: O(n log k), memory O(groups-per-task × k) rows — the shape
  * you want when n is 100 TB and k is 3. That map is still proportional
  * to group cardinality, so the exec tracks retained bytes against
  * `spark.graft.topk.maxRetainedBytes` (default 64 MiB/task) and above
  * it degrades to a spill-capable (group, rank) external sort + first-k
  * stream — window-form cost, bounded memory. More shuffle partitions
  * (fewer groups per task) restore the hash path.
  *
  * The caller must supply a TOTAL ordering (unique tie-break) for
  * deterministic results — same contract as every declared query. Group
  * keys must be orderable types (same restriction a window PARTITION BY
  * has) so the degrade path can sort by them.
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

  /** The heap cut never moves rows, so the child's partitioning holds
    * verbatim (r16 optimization round; guide §2.4). Without this
    * override the default UnknownPartitioning forced a fresh hash
    * exchange after EVERY heap cut whenever a downstream operator
    * needed clustering the child already had — the ANN pipelines
    * (shortlist → rerank → final top-k) paid one extra exchange per
    * search this way.
    */
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  /** Per-task byte budget for the heap map. The hash path retains
    * O(groups-per-task × k) row copies; above this budget the task
    * degrades to the spill-capable sort path below instead of OOMing on
    * a high-cardinality group column.
    */
  private val retainedBudget: Long = conf
    .getConfString("spark.graft.topk.maxRetainedBytes", (64L << 20).toString)
    .toLong

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val groupE = groupExprs
    val orderE = order
    val childOutput = child.output
    val budget = retainedBudget
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord = GenerateOrdering.generate(orderE, childOutput)
      // Max-heap w.r.t. the rank ordering: head = currently-worst kept
      // row, so replacement is O(log k).
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      def sizeOf(r: InternalRow): Long = r match {
        case u: UnsafeRow => u.getSizeInBytes.toLong + 32L // copy + heap entry overhead
        case _            => 128L
      }
      var retained = 0L
      var overBudget = false
      while (iter.hasNext && !overBudget) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = new mutable.PriorityQueue[InternalRow]()(ord)
            val c = row.copy()
            h += c
            heaps.put(key.copy(), h)
            retained += sizeOf(c) + sizeOf(key)
          case Some(h) =>
            if (h.size < kk) {
              val c = row.copy()
              h += c
              retained += sizeOf(c)
            } else if (ord.compare(row, h.head) < 0) {
              val dropped = h.dequeue()
              val c = row.copy()
              h += c
              retained += sizeOf(c) - sizeOf(dropped)
            }
        }
        overBudget = retained > budget
      }
      if (!overBudget) {
        // Emit each group's survivors in rank order (k is small; the
        // declared queries re-order globally anyway).
        heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
      } else {
        // Degrade path: too many distinct groups for the in-memory map.
        // Pour the retained candidates plus the unread remainder into
        // Spark's spill-capable external sorter ordered by (group, rank)
        // and stream the first k of each sorted group run. Correct
        // because a row evicted from a heap was dominated by k
        // better same-group rows, all of which reach the sorter.
        // Cost reverts to the window form's O(n log n) — but bounded
        // memory; raising shuffle partitions restores the hash path.
        val fullOrd = GenerateOrdering.generate(
          groupE.map(e => SortOrder(e, Ascending)) ++ orderE, childOutput)
        val schema = StructType(childOutput.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        val sorter = org.apache.spark.sql.graft.spill.rowSorter(schema, fullOrd)
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        def insert(r: InternalRow): Unit = r match {
          case u: UnsafeRow => sorter.insertRow(u)
          case other        => sorter.insertRow(toUnsafe(other))
        }
        heaps.valuesIterator.foreach(_.foreach(insert))
        heaps.clear()
        iter.foreach(insert)
        val sorted = sorter.sort()
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var emitted = 0
          private var pending: InternalRow = null
          private def pull(): Unit = {
            while (pending == null && sorted.hasNext) {
              val r = sorted.next() // row object is reused by the sorter
              val key = keyProj(r)
              if (curKey == null || key != curKey) {
                curKey = key.copy()
                emitted = 0
              }
              if (emitted < kk) { emitted += 1; pending = r }
            }
          }
          override def hasNext: Boolean = { pull(); pending != null }
          override def next(): InternalRow = {
            pull()
            val r = pending
            pending = null
            r
          }
        }
      }
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
