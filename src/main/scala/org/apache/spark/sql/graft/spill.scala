package org.apache.spark.sql.graft

import org.apache.spark.SparkEnv
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.UnsafeExternalRowSorter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

/** Synchronous listener-bus drain for listener-counting test asserts:
  * `sc.listenerBus` and `waitUntilEmpty` are `private[spark]`, and a
  * fixed sleep in their place is a race (a late-delivered JobStart
  * false-passes a zero-jobs assertion). Lives here for the same package
  * access reason as [[spill]].
  */
object listenerDrain {
  def apply(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

/** Bridge to Spark's spill-capable external row sorter (the machinery
  * behind SortExec). Lives in the sql package because the page-size
  * lookup (`SparkEnv.memoryManager`) is `private[spark]`.
  */
object spill {

  /** A spill-to-disk row sorter ordered entirely by `ord` (constant sort
    * prefix — no radix fast path, every comparison goes through the
    * record comparator). The sorter registers its own task-completion
    * cleanup; callers should still drain the returned iterator fully.
    */
  def rowSorter(schema: StructType,
      ord: Ordering[InternalRow]): UnsafeExternalRowSorter = {
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val res = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(
          row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        res.isNull = false
        res.value = 0L
        res
      }
    }
    UnsafeExternalRowSorter.create(
      schema, ord, PrefixComparators.LONG, prefixComputer,
      SparkEnv.get.memoryManager.pageSizeBytes, false)
  }
}
