package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 / the 100 TB playbook): when one join key
  * carries a disproportionate share of rows, salt the skewed (big) side
  * into `salts` sub-keys and explode the small side across all salts, so
  * the hot key's rows spread over `salts` tasks instead of one straggler.
  *
  * AQE's skew-join split handles sort-merge cases adaptively; explicit
  * salting remains the tool for aggregations and for joins AQE can't
  * split (e.g. under `Window`/`distinct` pipelines). Deterministic: the
  * salt is a hash of stable columns, not a random number.
  */
object SaltedJoin {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * `saltCols` must be stable columns of `big` (default: the key itself
    * hashed with xxhash64 over a row-unique column is better; pass one).
    */
  def join(big: DataFrame, small: DataFrame, key: String, saltCol: String,
      salts: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(col(saltCol)), lit(salts)))
    val exploded = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage salted aggregation: count/sum-style aggregates on a
    * skewed key — partial agg on (key, salt), final agg on key. The
    * partial stage caps any single task's share of a hot key at 1/salts.
    */
  def saltedCountSum(df: DataFrame, key: String, sumCol: String, saltCol: String,
      salts: Int = 8): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(saltCol)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(sumCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum("_n").as("n"), sum("_s").as(s"sum_$sumCol"))
}
