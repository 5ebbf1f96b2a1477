package graft.streaming

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ClickHouse-dialect shim over the generic JDBC sink path (SURVEY §2.1:
  * the upstream collector's optional ClickHouse insert).
  *
  * Offline constraint: no ClickHouse driver jar ships in this sandbox
  * (SURVEY §7.3 risk 5), so the dialect layer is pure SQL-string
  * generation (golden-tested) and the execution layer is plain
  * `java.sql` — point `url` at `jdbc:clickhouse://host:8123/db` with the
  * driver on the classpath in deployment, or at any JDBC database (the
  * specs use embedded Derby) to exercise the identical batching path.
  */
object ClickHouseDialect {

  /** Spark → ClickHouse type mapping for the flow schema's types.
    * Nullable columns wrap in Nullable(…) except String (CH convention:
    * absent string ≡ empty is NOT assumed — we keep Nullable for
    * addresses so "no IE present" stays distinct from "0.0.0.0").
    */
  def chType(f: StructField): String = {
    val base = f.dataType match {
      case TimestampType => "DateTime64(6)"
      case LongType      => "Int64"
      case IntegerType   => "Int32"
      case DoubleType    => "Float64"
      case BooleanType   => "UInt8"
      case BinaryType    => "String" // CH String is arbitrary bytes
      case StringType    => "String"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case other => throw new IllegalArgumentException(
        s"no ClickHouse mapping for ${f.name}: ${other.simpleString}")
    }
    if (f.nullable && f.dataType != BinaryType) s"Nullable($base)" else base
  }

  /** MergeTree DDL for a flow table: day-partitioned on start_ts,
    * ordered by (exporter, start_ts) — the scan pattern of a flow store
    * (per-exporter time ranges). Partition pruning + primary-key skip
    * indexing line up with the Parquet sink's date/hour layout.
    *
    * Sorting/partition key columns are forced non-Nullable: ClickHouse
    * rejects Nullable sorting keys by default, and the decoder always
    * emits exporter/start_ts.
    */
  def ddl(table: String, schema: StructType): String = {
    val keyCols = Set("exporter", "start_ts")
    val cols = schema.fields.map { f0 =>
      val f = if (keyCols(f0.name)) f0.copy(nullable = false) else f0
      s"  `${f.name}` ${chType(f)}"
    }.mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS `$table` (
       |$cols
       |) ENGINE = MergeTree
       |PARTITION BY toDate(`start_ts`)
       |ORDER BY (`exporter`, `start_ts`)""".stripMargin
  }

  /** Parameterized insert covering every schema column, in order. Bare
    * identifiers (flow columns are all plain lowercase) so the statement
    * is valid against ClickHouse AND any ANSI JDBC database — the spec
    * drives this exact path through Derby.
    */
  def insertSql(table: String, schema: StructType): String = {
    val names = schema.fieldNames.mkString(", ")
    val marks = schema.fieldNames.map(_ => "?").mkString(", ")
    s"INSERT INTO $table ($names) VALUES ($marks)"
  }
}

/** Batched JDBC sink speaking the ClickHouse dialect: executes the
  * MergeTree DDL once (when `createTable`), then per-partition
  * PreparedStatement batches of `batchSize` rows — CH wants few large
  * INSERTs, not row-at-a-time (each INSERT is a MergeTree part).
  *
  * Delivery semantics: foreachBatch is AT-LEAST-ONCE — on recovery Spark
  * RE-RUNS the failed epoch with the SAME batchId, so a crash after a
  * partial insert duplicates rows. `idempotent = true` upgrades replay
  * to exactly-once-on-success: every row carries a `graft_batch_id` column
  * and each write() first deletes the epoch's rows (`DELETE FROM t
  * WHERE graft_batch_id = ?` — ANSI, which Derby executes directly and
  * ClickHouse ≥22.8 runs as a lightweight delete) before inserting, so
  * a retried epoch REPLACES its partial output instead of appending to
  * it. The delete runs once, on the driver, before any partition
  * inserts — per-partition connections need no cross-connection
  * transaction for this to hold, only the delete-before-insert order
  * inside one write() call (Spark serializes retries of an epoch).
  * Exercised under Derby in StreamingSpec (no CH jar offline).
  */
final class ClickHouseFlowSink(url: String, table: String,
    user: String = "", password: String = "",
    batchSize: Int = 10000, createTable: Boolean = true,
    idempotent: Boolean = false)
    extends FlowPipeline.FlowSink {

  private def connect() = {
    if (user.nonEmpty) DriverManager.getConnection(url, user, password)
    else DriverManager.getConnection(url)
  }

  override def write(batch0: DataFrame, batchId: Long): Unit = {
    val batch =
      if (idempotent)
        batch0.withColumn("graft_batch_id", org.apache.spark.sql.functions.lit(batchId))
      else batch0
    val schema = batch.schema
    if (createTable) {
      val c = connect()
      try c.createStatement().execute(ClickHouseDialect.ddl(table, schema))
      finally c.close()
    }
    if (idempotent) {
      val c = connect()
      try {
        val del = c.prepareStatement(
          s"DELETE FROM $table WHERE graft_batch_id = ?")
        del.setLong(1, batchId)
        del.executeUpdate()
      } finally c.close()
    }
    val sql = ClickHouseDialect.insertSql(table, schema)
    val bs = batchSize
    val (u, usr, pw) = (url, user, password)
    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = if (usr.nonEmpty) DriverManager.getConnection(u, usr, pw)
                   else DriverManager.getConnection(u)
        try {
          val st = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { row =>
            var i = 0
            while (i < schema.length) {
              row.get(i) match {
                case null                 => st.setObject(i + 1, null)
                case b: Array[Byte]       => st.setBytes(i + 1, b)
                case ts: java.sql.Timestamp => st.setTimestamp(i + 1, ts)
                case v                    => st.setObject(i + 1, v)
              }
              i += 1
            }
            st.addBatch()
            n += 1
            if (n % bs == 0) st.executeBatch()
          }
          if (n % bs != 0) st.executeBatch()
          ()
        } finally conn.close()
      }
    }
  }
}
