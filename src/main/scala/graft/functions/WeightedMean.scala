package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate via the public `Aggregator[IN, BUF, OUT]`
  * API — the engine's user-extension surface for aggregation
  * (SURVEY.md §2b: the reference ships arbitrary reduce JS to mongod;
  * the Spark-native equivalent is this, compiled and merge-safe).
  *
  * Weighted mean: sum(x·w)/sum(w), null when total weight is 0. The
  * buffer is a pair of partial sums, so partial (map-side) aggregation
  * and shuffle-merge work exactly like built-in aggregates.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), java.lang.Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): java.lang.Double =
    if (b._2 == 0.0) null else java.lang.Double.valueOf(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
