package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Config-driven pipeline assembly — the nf2pq operating model (SURVEY
  * §1.1: a static TOML-style `nf2pq.conf` names listeners, output dir,
  * rotation interval, ClickHouse target). A reference user ports their
  * conf file and gets the same topology on Spark:
  *
  * {{{
  * [listener.primary]
  * port = 2055
  * partitions = 4
  *
  * [listener.backup]
  * host = 10.0.0.2
  * port = 2056
  *
  * [parquet]
  * dir = /data/flows
  * checkpoint = /ckpt/flows
  * interval = 60 seconds
  *
  * [clickhouse]
  * url = jdbc:clickhouse://ch:8123/netflow
  * table = flows
  * checkpoint = /ckpt/ch
  * }}}
  *
  * Listeners union into one packet stream → decode → every configured
  * sink. On a cluster you run one FlowApp per receiver host; the parquet
  * layout (date/hour partitions) is union-friendly downstream.
  */
object FlowApp {

  /** Minimal TOML-subset parser: `[section]` headers, `key = value`
    * pairs, `#` comments, optional double quotes around values. No
    * dependency, no types — values stay strings, consumers convert.
    * Repeated `[listener.X]` sections define one listener each.
    */
  def parseConfig(text: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var section = ""
    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
          out.getOrElseUpdate(section, scala.collection.mutable.LinkedHashMap.empty)
        } else line.indexOf('=') match {
          case -1 => throw new IllegalArgumentException(s"bad config line: $raw")
          case i =>
            val k = line.substring(0, i).trim
            val v0 = line.substring(i + 1).trim
            val v = if (v0.length >= 2 && v0.startsWith("\"") && v0.endsWith("\""))
              v0.substring(1, v0.length - 1) else v0
            out.getOrElseUpdate(section,
              scala.collection.mutable.LinkedHashMap.empty).put(k, v)
        }
      }
    }
    out.map { case (s, kv) => s -> kv.toMap }.toMap
  }

  /** One unified packet stream from every `[listener.*]` section. */
  def packetStream(spark: SparkSession,
      config: Map[String, Map[String, String]]): DataFrame = {
    val listeners = config.collect {
      case (name, kv) if name.startsWith("listener.") || name == "listener" => kv
    }.toSeq
    require(listeners.nonEmpty, "config has no [listener.*] section")
    listeners.map { kv =>
      kv.foldLeft(spark.readStream.format("udp-flows")) {
        case (r, (k, v)) => r.option(k, v)
      }.load()
    }.reduce(_ unionByName _)
  }

  /** Assemble and start the configured topology; returns the running
    * queries (one per sink). Caller owns awaitTermination/stop.
    */
  def start(spark: SparkSession,
      config: Map[String, Map[String, String]]): Seq[StreamingQuery] = {
    val flows = FlowPipeline.decode(packetStream(spark, config))
    val parquetQ = config.get("parquet").map { p =>
      FlowPipeline.startParquetSink(flows,
        p.getOrElse("dir",
          throw new IllegalArgumentException("[parquet] needs dir")),
        p.getOrElse("checkpoint",
          throw new IllegalArgumentException("[parquet] needs checkpoint")),
        p.getOrElse("interval", "60 seconds"))
    }
    val chQ = config.get("clickhouse").map { c =>
      val sink = new ClickHouseFlowSink(
        c.getOrElse("url",
          throw new IllegalArgumentException("[clickhouse] needs url")),
        c.getOrElse("table", "flows"),
        c.getOrElse("user", ""), c.getOrElse("password", ""),
        c.getOrElse("batch_size", "10000").toInt,
        c.getOrElse("create_table", "true").toBoolean)
      FlowPipeline.startForeachBatchSink(flows, sink,
        c.getOrElse("checkpoint",
          throw new IllegalArgumentException("[clickhouse] needs checkpoint")),
        c.getOrElse("interval", "60 seconds"))
    }
    val qs = parquetQ.toSeq ++ chQ.toSeq
    require(qs.nonEmpty, "config has no sink section ([parquet]/[clickhouse])")
    qs
  }

  def start(spark: SparkSession, configText: String): Seq[StreamingQuery] =
    start(spark, parseConfig(configText))
}
