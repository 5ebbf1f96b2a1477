package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.classic.ExpressionUtils

import graft.functions.{CosineSimilarity, MinHashSignature, SignLshBuckets, SimHash64}

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

  /** 64-bit SimHash over an array<bigint> of element hashes. */
  def simhash64(hashes: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(hashes)))

  /** MinHash signature (k permutations) over pre-hashed shingles. */
  def minhash_signature(hashes: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(hashes), k))

  /** Sign-LSH bucket per hash table (array of length `tables`). */
  def sign_lsh_buckets(emb: Column, nbits: Int, tables: Int): Column =
    ExpressionUtils.column(SignLshBuckets(ExpressionUtils.expression(emb), nbits, tables))

  /** Register `cosine_similarity` for SQL text in an existing session.
    * (New sessions can instead use `spark.sql.extensions=graft.GraftExtensions`.)
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
}
