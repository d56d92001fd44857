package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` examples — the Dataset-native custom-aggregation
  * API (mergeable buffers → works as partial aggregation, exactly like a
  * built-in agg at scale).
  */
object TypedAggregators {

  /** Bounded top-k largest values per group: the buffer is a sorted
    * vector capped at k, so state is O(k) regardless of group size and
    * merges associatively across partitions.
    */
  class TopK(k: Int) extends Aggregator[Double, Vector[Double], Seq[Double]] {
    override def zero: Vector[Double] = Vector.empty
    override def reduce(b: Vector[Double], a: Double): Vector[Double] =
      ((b :+ a).sortBy(-_)).take(k)
    override def merge(b1: Vector[Double], b2: Vector[Double]): Vector[Double] =
      (b1 ++ b2).sortBy(-_).take(k)
    override def finish(r: Vector[Double]): Seq[Double] = r
    override def bufferEncoder: Encoder[Vector[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Log-sum-exp with the max-shift trick — the numerically-stable
    * reduction used for probability mass; buffer (max, sumExp) merges
    * associatively.
    */
  class LogSumExp extends Aggregator[Double, (Double, Double), Double] {
    override def zero: (Double, Double) = (Double.NegativeInfinity, 0.0)
    override def reduce(b: (Double, Double), a: Double): (Double, Double) =
      merge(b, (a, 1.0))
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
      if (a._1 == Double.NegativeInfinity) b
      else if (b._1 == Double.NegativeInfinity) a
      else {
        val m = math.max(a._1, b._1)
        (m, a._2 * math.exp(a._1 - m) + b._2 * math.exp(b._1 - m))
      }
    }
    override def finish(r: (Double, Double)): Double =
      if (r._1 == Double.NegativeInfinity) Double.NegativeInfinity
      else r._1 + math.log(r._2)
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
