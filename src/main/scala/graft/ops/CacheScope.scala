package graft.ops

import org.apache.spark.sql.SparkSession

/** Deterministic release of the cache blocks an ops pipeline leaves
  * behind (SURVEY §2.10 cache-lifecycle note). [[Components]] and the
  * [[Sketches]]/[[IvfIndex]] builders persist skinny intermediates and
  * lineage-truncate via `localCheckpoint` — both register RDDs with the
  * context's persistence registry, and neither handle is reachable from
  * the lazy DataFrame they return, so without a scope the blocks are
  * only reclaimed by LRU eviction. A long-lived service wraps each
  * pipeline:
  *
  * {{{
  * val scope = CacheScope.begin(spark)
  * val labels = Components.connectedComponents(nodes, edges)
  * labels.write.parquet(...)   // consume FULLY first
  * scope.release()             // then free every block the run pinned
  * }}}
  *
  * The scope snapshots the registry at `begin` and on `release`
  * unpersists every RDD registered since — persisted DataFrames' cache
  * RDDs and local-checkpoint RDDs alike. Two constraints, both inherent
  * to the snapshot design: (1) release only after the pipeline's output
  * is fully consumed — checkpointed RDDs have no lineage to recompute
  * from; (2) one scope per concurrently-running pipeline per session
  * (concurrent begins would claim each other's blocks). These are the
  * semantics of a job-scoped arena, which is the intended use.
  */
final class CacheScope private (spark: SparkSession, before: Set[Int]) {

  /** RDD ids this scope would release right now (registered since begin,
    * staged pins excluded).
    */
  def pendingIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet --
      before -- CacheScope.pinnedIds

  /** Unpersist every RDD registered since `begin`. Idempotent; `blocking`
    * waits for block removal (tests) vs fire-and-forget (services).
    */
  def release(blocking: Boolean = false): Unit =
    spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before(id) || CacheScope.pinned(id) }
      .values.foreach(_.unpersist(blocking))
}

object CacheScope {
  def begin(spark: SparkSession): CacheScope =
    new CacheScope(spark, spark.sparkContext.getPersistentRDDs.keySet.toSet)

  /** STAGED-STATE pins (r15): session-lifetime serving state built
    * lazily inside a pipeline (the staged adjacency RDD — first
    * traversal per corpus stages it) would otherwise be registered
    * DURING some consumer's scope and reclaimed at its release,
    * silently degrading every later run to lineage recompute. Pinning
    * declares "this block is ingest-time state, not a pipeline
    * intermediate" — scopes skip it; it ages out with its session (or
    * by an explicit unpersist on fixture refresh). The id set is
    * context-global and append-few (one per staged family × corpus).
    */
  def pinStaged(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    pinnedSet.add(rdd.id)

  private[ops] def pinned(id: Int): Boolean = pinnedSet.contains(id)
  private[ops] def pinnedIds: Set[Int] = {
    import scala.jdk.CollectionConverters._
    pinnedSet.asScala.map(_.intValue).toSet
  }
  private val pinnedSet =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Integer]()
}
