package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the normative operator inventory (SURVEY §2): one entry per
  * declared operation, each paired (where SQL-expressible) with DuckDB
  * oracle SQL in `oracleSql` used by the driver's hash-match gate.
  */
object SparkEntry {
  private def modules: Seq[Map[String, Q]] = Seq(
    _root_.graft.queries.Relational.defs,
    _root_.graft.queries.Windows.defs,
    _root_.graft.queries.Scalars.defs,
    _root_.graft.queries.Events.defs,
    _root_.graft.queries.TextOps.defs,
    _root_.graft.queries.Approx.defs,
    _root_.graft.queries.Extra.defs,
    _root_.graft.queries.Extra2.defs
  )

  private lazy val all: Map[String, Q] = modules.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("agg_pricing").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
