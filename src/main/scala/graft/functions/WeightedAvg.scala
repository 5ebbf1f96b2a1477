package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` example (SURVEY §2.10): exact
  * weighted average with a two-field buffer. Register with
  * `spark.udf.register("weighted_avg", udaf(WeightedAvg))`.
  *
  * The merge is associative+commutative, so Spark runs it partial+final
  * (map-side combine) like any built-in — the 100 TB-safe shape for a
  * custom aggregate.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
