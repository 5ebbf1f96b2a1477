package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the normative operator inventory (SURVEY §2): one entry per
  * declared operation, each paired (where SQL-expressible) with DuckDB
  * oracle SQL in `oracleSql` used by the driver's hash-match gate.
  */
object SparkEntry {

  /** Replace DecimalType with DoubleType anywhere in a type tree. */
  private def toDoubleType(dt: DataType): DataType = dt match {
    case _: DecimalType   => DoubleType
    case ArrayType(e, n)  => ArrayType(toDoubleType(e), n)
    case MapType(k, v, n) => MapType(toDoubleType(k), toDoubleType(v), n)
    case StructType(fs) =>
      StructType(fs.map(f => f.copy(dataType = toDoubleType(f.dataType))))
    case other => other
  }

  /** Emission contract (round-3): internal arithmetic stays DECIMAL — the
    * determinism workhorse of SURVEY §2.11 — but every declared query's
    * FINAL output casts decimals to DOUBLE. The driver's compare is
    * pandas-based: DuckDB's `.df()` turns its DECIMAL results into float64
    * while `pandas.read_parquet` of a Spark decimal dump yields `object`
    * dtype `decimal.Decimal` — bit-different hashes for numerically
    * identical values (round-2 root cause: 38/39 hash-only fails). Both
    * engines convert an exact decimal to the nearest double (Spark via
    * BigDecimal.doubleValue, DuckDB via unscaled/10^scale — correctly
    * rounded while the unscaled value fits 53 bits), so the doubles are
    * bit-identical and the pandas hash matches.
    */
  private[graft] def emitDoubles(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    if (!fields.exists(f => toDoubleType(f.dataType) != f.dataType)) df
    else df.select(fields.map { f =>
      val t = toDoubleType(f.dataType)
      if (t == f.dataType) col(f.name) else col(f.name).cast(t).as(f.name)
    }.toIndexedSeq: _*)
  }
  private def modules: Seq[Map[String, Q]] = Seq(
    _root_.graft.queries.Relational.defs,
    _root_.graft.queries.Windows.defs,
    _root_.graft.queries.Scalars.defs,
    _root_.graft.queries.Events.defs,
    _root_.graft.queries.TextOps.defs,
    _root_.graft.queries.Approx.defs,
    _root_.graft.queries.Extra.defs,
    _root_.graft.queries.Extra2.defs,
    _root_.graft.queries.Extra3.defs,
    _root_.graft.queries.Extra4.defs,
    _root_.graft.queries.Extra5.defs,
    _root_.graft.queries.Extra6.defs,
    _root_.graft.queries.Extra7.defs,
    _root_.graft.queries.Extra8.defs,
    _root_.graft.queries.Extra9.defs,
    _root_.graft.queries.Extra10.defs,
    _root_.graft.queries.Extra11.defs,
    _root_.graft.queries.Extra12.defs,
    _root_.graft.queries.Extra13.defs,
    _root_.graft.queries.Extra14.defs,
    _root_.graft.queries.Extra15.defs,
    _root_.graft.queries.Extra16.defs,
    _root_.graft.queries.Extra17.defs,
    _root_.graft.queries.Extra18.defs,
    _root_.graft.queries.Extra19.defs,
    _root_.graft.queries.Extra20.defs,
    _root_.graft.queries.Extra21.defs,
    _root_.graft.queries.Extra22.defs,
    _root_.graft.queries.Extra23.defs,
    _root_.graft.queries.Extra24.defs,
    _root_.graft.queries.Extra25.defs,
    _root_.graft.queries.Extra26.defs
  )

  private lazy val all: Map[String, Q] = {
    // Duplicate-key guard (r16): `Map ++` silently lets a later module
    // SHADOW an earlier module's query — r16 nearly shipped a second
    // `eval_ndcg` that overrode Extra21's and broke its spec while
    // every declared gate stayed green. Fail loudly at first use
    // instead.
    val dups = modules.flatMap(_.keys)
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query keys across modules: ${dups.toSeq.sorted.mkString(", ")}")
    modules.reduce(_ ++ _)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    emitDoubles(all("agg_pricing").fn(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2.
    * Each is wrapped in [[emitDoubles]]: a no-op for decimal-free results
    * (the already-green queries are untouched), a final-select cast for the
    * rest. The cast is a projection appended after any ORDER BY, so row
    * order and plan shape below it are unchanged.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) =>
      k -> ((s: SparkSession, d: String) => emitDoubles(q.fn(s, d)))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
