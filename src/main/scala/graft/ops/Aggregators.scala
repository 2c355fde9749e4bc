package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Custom typed-UDAF surface (SURVEY.md §2.10): a one-pass moment
 * sketch (n, Σx, Σx²) as an `Aggregator`, registered through
 * `functions.udaf`. The buffer is a fixed-size triple that
 * partial-aggregates map-side and merges associatively — the same
 * mergeable-summary contract every builtin aggregate obeys, which is
 * what makes it safe at any scale. Mean/variance derive from the
 * moments at the caller.
 */
object MomentsAgg extends Aggregator[Double, (Long, Double, Double), (Long, Double, Double)] {
  override def zero: (Long, Double, Double) = (0L, 0.0, 0.0)
  override def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) =
    (b._1 + 1, b._2 + x, b._3 + x * x)
  override def merge(a: (Long, Double, Double), b: (Long, Double, Double)): (Long, Double, Double) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)
  override def finish(r: (Long, Double, Double)): (Long, Double, Double) = r
  override def bufferEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
}
