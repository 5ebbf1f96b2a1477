package graft.streaming

import java.sql.Timestamp
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, MapState, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** The nf2pq-shaped pipeline (SURVEY §3.1/§3.4), Spark-native:
  *
  *   UDP source → decode (template state inside the decode stage) →
  *   normalize to FlowSchema → time-rotated Parquet sink and/or
  *   ClickHouse-shaped JDBC sink, with an optional stateful flow-expiry
  *   operator reproducing a collector's flow-cache semantics.
  */
object FlowPipeline {

  /** Cross-micro-batch template cache, the collector operating model a
    * per-batch decode cannot reproduce: a v9/IPFIX exporter sends its
    * templates PERIODICALLY (not per packet), so data records routinely
    * arrive in a later micro-batch than the template that describes
    * them. The reference keeps templates for the collector process
    * lifetime; the Spark-native equivalent is this per-EXECUTOR store
    * (exporters are sticky to a listener/partition, so an exporter's
    * template and data packets decode on the same executor — the same
    * co-location the reference's per-listener threads assume).
    *
    * Scoped by caller-chosen name so concurrent pipelines/tests cannot
    * cross-pollinate. Honest recovery caveat (shared with the
    * reference): after a JVM restart the store is empty, so replayed or
    * fresh data records decode as data-before-template errors until the
    * exporter re-sends its templates — which the protocol's periodic
    * template refresh guarantees it will.
    */
  object TemplateStore {
    /** Per-scope entry cap — the spoof-flood bound. TemplateKey embeds
      * the exporter's (unauthenticated, spoofable) UDP source address,
      * so an attacker spraying template packets from random spoofed
      * sources would otherwise grow executor heap without limit where a
      * real collector expires templates. LRU past the cap: churned and
      * spoofed exporters age out; [[record]] refreshes recency for EVERY
      * template in the decoder's live map (not just changed ones), so a
      * stable exporter stays hot as long as its partition sees any
      * template activity at all. The residual window: a batch with ZERO
      * template changes calls record() never, so recency then rests on
      * the protocol's periodic template re-sends — which also re-warm
      * the store after a genuine eviction. 2¹⁶ entries ≈ a few MB, far
      * above any legitimate exporter fleet.
      */
    @volatile var maxEntriesPerScope: Int = 1 << 16
    private final class Lru extends java.util.LinkedHashMap[
        NetFlowCodec.TemplateKey, NetFlowCodec.Template](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[NetFlowCodec.TemplateKey, NetFlowCodec.Template])
          : Boolean = size() > maxEntriesPerScope
    }
    private val scopes =
      new java.util.concurrent.ConcurrentHashMap[String, Lru]()
    private def cache(scope: String): Lru =
      scopes.computeIfAbsent(scope, _ => new Lru)
    def snapshot(scope: String): Map[NetFlowCodec.TemplateKey, NetFlowCodec.Template] = {
      import scala.jdk.CollectionConverters._
      val c = cache(scope)
      c.synchronized { c.asScala.toMap }
    }
    /** Write back templates that are new or changed vs `before`, and
      * refresh access-order recency for every key in `now` — without the
      * touch, a stable live exporter's entry (inserted once, then read
      * only via partition-start snapshots, which do not count as LRU
      * access) would sit coldest and be evicted FIRST under the exact
      * spoof flood the cap defends against.
      *
      * The touch is `get`, NOT an unconditional re-put: a partition
      * whose snapshot predates another partition's newer write must not
      * clobber it with the stale value (exporter redefines template T;
      * partition A records T=v2; partition B, still holding T=v1 in its
      * threaded map, records an unrelated change — re-putting its whole
      * map would silently roll T back to v1 and corrupt every following
      * decode until the next periodic re-send). `get` refreshes recency
      * when present; a key evicted between snapshot and write-back is
      * re-inserted. Changed templates put last-writer-wins, matching the
      * protocol (a re-sent template replaces its predecessor; exporters
      * are partition-sticky, so concurrent same-key changes are the rare
      * case, not the steady state).
      */
    def record(scope: String,
        now: Map[NetFlowCodec.TemplateKey, NetFlowCodec.Template],
        before: Map[NetFlowCodec.TemplateKey, NetFlowCodec.Template]): Unit = {
      val c = cache(scope)
      c.synchronized {
        now.foreach { case (k, v) =>
          if (!before.get(k).contains(v)) c.put(k, v) // new or changed
          else if (c.get(k) == null) c.put(k, v) // evicted since snapshot
          // else: get() above refreshed recency — nothing to write
        }
      }
      ()
    }
    def clear(scope: String): Unit = { scopes.remove(scope); () }
  }

  /** Decode raw packet rows (recv_ts, peer, payload) into flow records.
    *
    * Template state lives per executor-partition (the decoder threads an
    * immutable map through the packets of one partition, in arrival
    * order). Exporters are sticky to a listener/partition in deployment,
    * so templates and their data records co-locate — same assumption the
    * reference's per-listener threads make. mapPartitions is justified
    * here (SURVEY §2.10: imperative per-partition logic with local state).
    *
    * `templateScope`: None (default) keeps the stage PURE — template
    * state starts empty every batch/run, results are a function of the
    * input alone (what the batch/replay tests rely on). Some(scope)
    * additionally seeds from and writes back to [[TemplateStore]], the
    * streaming-collector mode where templates outlive the micro-batch.
    */
  /** One decode pass extracting a view of each packet's DecodeResult —
    * shared by [[decode]] and [[decodeOptions]] so the template-threading
    * logic cannot drift between them. (Two *sinks* on the same packets
    * still mean two executions of this stage — that is Spark's streaming
    * model, one source instantiation per query — but options sets are a
    * vanishingly small fraction of collector traffic.)
    */
  private def decodeStage[T](packets: DataFrame,
      templateScope: Option[String])(
      extract: NetFlowCodec.DecodeResult => Seq[T])(
      implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    val spark = packets.sparkSession
    import spark.implicits._
    val scope = templateScope // capture the string, not the outer class
    packets.select(col("recv_ts"), col("peer"), col("payload"))
      .as[(Timestamp, String, Array[Byte])]
      .mapPartitions { it =>
        var templates = scope.map(TemplateStore.snapshot)
          .getOrElse(Map.empty[NetFlowCodec.TemplateKey, NetFlowCodec.Template])
        it.flatMap { case (recvTs, peer, payload) =>
          val us = recvTs.getTime * 1000L + (recvTs.getNanos / 1000L) % 1000L
          val res = NetFlowCodec.decode(peer, us, payload, templates)
          if (res.templates ne templates)
            scope.foreach(TemplateStore.record(_, res.templates, templates))
          templates = res.templates
          extract(res)
        }
      }
  }

  def decode(packets: DataFrame): Dataset[FlowRecord] =
    decode(packets, templateScope = None)

  def decode(packets: DataFrame,
      templateScope: Option[String]): Dataset[FlowRecord] =
    decodeStage(packets, templateScope)(_.records)(Encoders.product[FlowRecord])

  /** Options metadata stream (sampling config, exporter stats) decoded
    * from the same raw packets — template state threaded per partition
    * exactly like [[decode]].
    */
  def decodeOptions(packets: DataFrame): Dataset[NetFlowCodec.OptionsRecord] =
    decodeOptions(packets, templateScope = None)

  def decodeOptions(packets: DataFrame,
      templateScope: Option[String]): Dataset[NetFlowCodec.OptionsRecord] =
    decodeStage(packets, templateScope)(_.options)(
      Encoders.product[NetFlowCodec.OptionsRecord])

  /** Decode-error stream — malformed packets, data before template,
    * truncated sets. A collector that silently drops these is
    * undebuggable; route this to a metrics sink or log table.
    */
  def decodeErrors(packets: DataFrame): Dataset[String] =
    decodeErrors(packets, templateScope = None)

  def decodeErrors(packets: DataFrame,
      templateScope: Option[String]): Dataset[String] =
    decodeStage(packets, templateScope)(_.errors)(Encoders.STRING)

  /** De-sample flow counters with each exporter's advertised packet-
    * sampling interval (options IE 34 / IPFIX 305): bytes/packets × N for
    * "1 in N" sampling. Exporters without options records pass through
    * at ×1. Broadcast-sized right side: one row per (exporter, domain).
    *
    * BATCH-ONLY: the groupBy+max on the options side and the broadcast
    * join are both unsupported on unbounded streaming inputs (Spark would
    * raise AnalysisException at start()). In a streaming job use
    * [[desampleEachBatch]], which snapshot-joins per micro-batch.
    */
  def desample(flows: Dataset[FlowRecord],
      options: Dataset[NetFlowCodec.OptionsRecord]): DataFrame = {
    val rates = options.toDF()
      .select(col("exporter"), col("domain"),
        coalesce(element_at(col("values"), lit(34)),
          element_at(col("values"), lit(305))).as("sampling_interval"))
      .filter(col("sampling_interval").isNotNull)
      // A reconfiguring exporter emits several options records; keep the
      // highest advertised interval (deterministic; a ts-ordered last()
      // would need recv_ts carried onto OptionsRecord).
      .groupBy("exporter", "domain")
      .agg(max("sampling_interval").as("sampling_interval"))
    flows.toDF()
      .join(broadcast(rates), Seq("exporter", "domain"), "left")
      .withColumn("sampling_interval", coalesce(col("sampling_interval"), lit(1L)))
      .withColumn("bytes", col("bytes") * col("sampling_interval"))
      .withColumn("packets", col("packets") * col("sampling_interval"))
  }

  /** Streaming form of [[desample]]: run the flow stream through
    * foreachBatch and apply the batch desample against a fresh SNAPSHOT
    * of the rates per micro-batch. `optionsSnapshot` re-reads whatever
    * the options stream is being persisted to (e.g. the parquet table a
    * [[decodeOptions]]-fed sink maintains) — the standard Spark shape for
    * a slowly-changing dimension joined to a stream: each micro-batch is
    * a bounded DataFrame, so the groupBy+broadcast inside [[desample]]
    * are legal again, and a reconfigured sampling interval takes effect
    * at the next trigger.
    */
  def desampleEachBatch(flows: Dataset[FlowRecord],
      optionsSnapshot: SparkSession => Dataset[NetFlowCodec.OptionsRecord])(
      writeBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[FlowRecord] =
    flows.writeStream.foreachBatch { (batch: Dataset[FlowRecord], id: Long) =>
      writeBatch(desample(batch, optionsSnapshot(batch.sparkSession)), id)
    }

  /** Time-rotated Parquet sink: the reference rotates output files on a
    * wall-clock interval; the Spark-native equivalent is date/hour
    * partition directories + a processing-time trigger + checkpointed
    * exactly-once file commits.
    */
  def startParquetSink(flows: Dataset[FlowRecord], outDir: String,
      checkpointDir: String, interval: String = "60 seconds"): StreamingQuery =
    flows.toDF()
      .withColumn("date", date_format(col("start_ts"), "yyyy-MM-dd"))
      .withColumn("hour", date_format(col("start_ts"), "HH"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("date", "hour")
      .trigger(Trigger.ProcessingTime(interval))
      .outputMode(OutputMode.Append())
      .start()

  /** Batch-sink abstraction used from foreachBatch — the reference's
    * optional ClickHouse insert is one implementation.
    */
  trait FlowSink extends Serializable {
    def write(batch: DataFrame, batchId: Long): Unit
  }

  /** ClickHouse-shaped JDBC sink (`jdbc:clickhouse://host:8123/db`).
    * Compile-only in this sandbox — no CH driver jar offline (SURVEY §7.3
    * risk 5); the JDBC path itself is exercised against any JDBC URL.
    */
  final class JdbcFlowSink(url: String, table: String,
      user: String = "", password: String = "") extends FlowSink {
    override def write(batch: DataFrame, batchId: Long): Unit = {
      val props = new Properties()
      if (user.nonEmpty) props.setProperty("user", user)
      if (password.nonEmpty) props.setProperty("password", password)
      batch.write.mode("append").jdbc(url, table, props)
    }
  }

  /** Collect each micro-batch into `sink` (ClickHouse, test buffers, …). */
  def startForeachBatchSink(flows: Dataset[FlowRecord], sink: FlowSink,
      checkpointDir: String, interval: String = "60 seconds"): StreamingQuery =
    flows.toDF().writeStream
      .foreachBatch((df: DataFrame, id: Long) => sink.write(df, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(interval))
      .outputMode(OutputMode.Append())
      .start()

  /** One packet-level observation feeding the flow cache. */
  final case class PacketObs(flow_key: String, ts: Timestamp, packets: Long, bytes: Long)

  /** Raw packet row for the durable-template decode path. */
  final case class RawPacket(recv_ts: Timestamp, peer: String,
      payload: Array[Byte])

  /** Template identity within one exporter's state partition (the
    * exporter itself is the group key).
    */
  final case class TmplId(domain: Long, templateId: Int)

  /** Streaming decode with templates as MANAGED state
    * (`transformWithState` keyed by exporter, template map in the
    * checkpointed state store): unlike [[TemplateStore]] — a
    * per-executor JVM cache that empties on restart until the exporter's
    * periodic template refresh — managed state is restored from the
    * checkpoint on restart/reassignment, so a data record arriving in
    * the first post-restart batch decodes WITHOUT a refresh, and
    * exactly-once replay re-derives identical state (templates are
    * immutable values keyed by (exporter, domain, templateId);
    * last-writer-wins matches the protocol). Packets are processed in
    * receive-timestamp order within each (exporter, batch) group — the
    * same order the per-partition decoder sees, made explicit because
    * a grouped iterator carries no arrival-order guarantee.
    *
    * Scale shape: state partitions by exporter (the collector's natural
    * shard key — thousands of exporters spread over the cluster, each
    * group a few templates + its batch of packets); RocksDB state store
    * exercised in StreamingSpec, including a crash + restart-from-
    * checkpoint decode WITHOUT re-sending the template.
    */
  final class DurableTemplateProcessor
      extends StatefulProcessor[String, RawPacket, FlowRecord] {
    @transient private var templates: MapState[TmplId, NetFlowCodec.Template] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      templates = getHandle.getMapState[TmplId, NetFlowCodec.Template](
        "templates", Encoders.product[TmplId],
        Encoders.product[NetFlowCodec.Template], TTLConfig.NONE)

    override def handleInputRows(peer: String, rows: Iterator[RawPacket],
        tv: TimerValues): Iterator[FlowRecord] = {
      // Rehydrate this exporter's template map from the (checkpointed)
      // store, then thread it through the batch's packets exactly like
      // the per-partition decoder.
      val seed = templates.iterator().map { case (k, v) =>
        NetFlowCodec.TemplateKey(peer, k.domain, k.templateId) -> v
      }.toMap
      val sorted = rows.toArray.sortBy(p => (p.recv_ts.getTime, p.recv_ts.getNanos))
      var tmpl = seed
      val out = Vector.newBuilder[FlowRecord]
      sorted.foreach { p =>
        val us = p.recv_ts.getTime * 1000L + (p.recv_ts.getNanos / 1000L) % 1000L
        val res = NetFlowCodec.decode(peer, us, p.payload, tmpl)
        tmpl = res.templates
        out ++= res.records
      }
      // Persist new/changed templates; unchanged entries are already in
      // the store (no LRU here — state is per-exporter and checkpointed,
      // so the spoof-flood cap concern is the state-store's sizing, not
      // a JVM heap race).
      tmpl.foreach { case (k, v) =>
        if (!seed.get(k).contains(v))
          templates.updateValue(TmplId(k.domain, k.templateId), v)
      }
      out.result().iterator
    }
  }

  /** [[decode]] with checkpoint-durable template state — see
    * [[DurableTemplateProcessor]]. Streaming-only (transformWithState
    * requires a streaming query and the RocksDB state store).
    */
  def decodeDurable(packets: DataFrame): Dataset[FlowRecord] = {
    val spark = packets.sparkSession
    import spark.implicits._
    packets.select(col("recv_ts"), col("peer"), col("payload"))
      .as[RawPacket]
      .groupByKey(_.peer)
      .transformWithState(new DurableTemplateProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Flow-cache state: aggregate of a live flow. */
  final case class FlowAgg(first_ms: Long, last_ms: Long, packets: Long, bytes: Long)

  /** Expired flow emitted once its key has been idle > `idleMs`. */
  final case class ExpiredFlow(flow_key: String, start_ms: Long, end_ms: Long,
      packets: Long, bytes: Long)

  /** Flow expiry on the Spark 4 arbitrary-state API
    * (`transformWithState` + `StatefulProcessor`): same flow-cache
    * semantics as [[expireFlows]], with explicit value state and
    * event-time timers.
    */
  final class FlowExpiryProcessor(idleMs: Long)
      extends StatefulProcessor[String, PacketObs, ExpiredFlow] {
    @transient private var agg: ValueState[FlowAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[FlowAgg]("agg",
        Encoders.product[FlowAgg], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[PacketObs],
        tv: TimerValues): Iterator[ExpiredFlow] = {
      val prev = if (agg.exists()) agg.get() else FlowAgg(Long.MaxValue, 0L, 0L, 0L)
      val updated = rows.foldLeft(prev) { (a, o) =>
        val t = o.ts.getTime
        FlowAgg(math.min(a.first_ms, t), math.max(a.last_ms, t),
          a.packets + o.packets, a.bytes + o.bytes)
      }
      agg.update(updated)
      // One live timer per key: replace any earlier deadline.
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(updated.last_ms + idleMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ExpiredFlow] = {
      if (!agg.exists()) Iterator.empty
      else {
        val a = agg.get()
        agg.clear()
        Iterator.single(ExpiredFlow(key, a.first_ms, a.last_ms, a.packets, a.bytes))
      }
    }
  }

  /** [[expireFlows]] semantics on transformWithState. */
  def expireFlowsTws(packets: Dataset[PacketObs], idleMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[ExpiredFlow] = {
    val spark = packets.sparkSession
    import spark.implicits._
    packets
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.flow_key)
      .transformWithState(new FlowExpiryProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stateful flow expiry — the collector's flow-cache semantics
    * (SURVEY §2.9): per-key aggregation state, a record emitted when the
    * key has been idle past the timeout. Event-time timeout keyed off the
    * watermark, so state is bounded and replayable.
    */
  def expireFlows(packets: Dataset[PacketObs], idleMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[ExpiredFlow] = {
    val spark = packets.sparkSession
    import spark.implicits._
    packets
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.flow_key)
      .flatMapGroupsWithState[FlowAgg, ExpiredFlow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, obs: Iterator[PacketObs], state: GroupState[FlowAgg]) =>
          if (state.hasTimedOut) {
            val agg = state.get
            state.remove()
            Iterator.single(ExpiredFlow(key, agg.first_ms, agg.last_ms, agg.packets, agg.bytes))
          } else {
            val batch = obs.toSeq
            val prev = state.getOption.getOrElse(FlowAgg(Long.MaxValue, 0L, 0L, 0L))
            val agg = batch.foldLeft(prev) { (a, o) =>
              val t = o.ts.getTime
              FlowAgg(math.min(a.first_ms, t), math.max(a.last_ms, t),
                a.packets + o.packets, a.bytes + o.bytes)
            }
            state.update(agg)
            state.setTimeoutTimestamp(agg.last_ms + idleMs)
            Iterator.empty
          }
      }
  }
}
