package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.classic.ExpressionUtils

import graft.functions.CosineSimilarity

/** Bridge into Spark's `private[sql]` Expression↔Column surface for the
  * engine's native expressions. Lives under `org.apache.spark.sql` on
  * purpose — the standard pattern for Spark extension libraries that
  * expose custom Catalyst expressions as `Column`s without forcing
  * session-build-time extension wiring.
  */
object native {

  /** `cosine_similarity($"a", $"b")` as a Column. */
  def cosine_similarity(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register `cosine_similarity` for SQL text in an existing session.
    * (New sessions can instead use `spark.sql.extensions=graft.GraftExtensions`.)
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
}
