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

  /** One-pass mergeable quantile sketch: an equi-width histogram over
    * caller-supplied bounds. Counts merge by vector addition (fully
    * associative + commutative → deterministic under any partitioning,
    * unlike centroid sketches whose result depends on merge order), and a
    * quantile is answered by walking the cumulative counts and
    * interpolating within the hit bin — error bounded by bin width.
    * O(bins) state per group at any data scale; out-of-range values clamp
    * to the edge bins.
    */
  class QuantileHistogram(lo: Double, hi: Double, bins: Int = 256)
      extends Aggregator[Double, Array[Long], Array[Long]] {
    require(hi > lo && bins >= 1)
    private def binOf(v: Double): Int = {
      val b = ((v - lo) / (hi - lo) * bins).toInt
      math.max(0, math.min(bins - 1, b))
    }
    override def zero: Array[Long] = new Array[Long](bins)
    override def reduce(b: Array[Long], a: Double): Array[Long] = {
      b(binOf(a)) += 1; b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bins) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    /** Interpolated quantile (q in [0,1]) from a finished histogram. */
    def quantile(counts: Array[Long], q: Double): Double = {
      val total = counts.sum
      if (total == 0) return Double.NaN
      val target = q * total
      var cum = 0L
      var i = 0
      val width = (hi - lo) / bins
      while (i < bins) {
        if (cum + counts(i) >= target) {
          val within = if (counts(i) == 0) 0.0
            else (target - cum) / counts(i)
          return lo + (i + within) * width
        }
        cum += counts(i)
        i += 1
      }
      hi
    }
  }

  /** Elementwise vector sum + count — averages embedding columns without
    * exploding to (row × dim) shape: aggregator state is one dim-length
    * array per group, merged by vector addition. The Lloyd-iteration /
    * centroid primitive at any scale.
    */
  class VectorMean extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)
    override def reduce(b: (Array[Double], Long), a: Seq[Double]): (Array[Double], Long) = {
      if (b._1.isEmpty) (a.toArray, 1L)
      else {
        var i = 0
        val arr = b._1
        while (i < arr.length) { arr(i) += a(i); i += 1 }
        (arr, b._2 + 1)
      }
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    }
    override def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Misra-Gries heavy-hitters sketch: at most k counters per buffer; any
    * item with true frequency > N/k is guaranteed present, and every
    * estimate undercounts by at most N/k. Buffers merge by counter
    * addition followed by the standard (k+1)-th-largest subtraction — the
    * bounded-state way to find top terms over a corpus too big to
    * count exactly.
    */
  class HeavyHitters(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1)
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      b.get(a) match {
        case Some(c) => b.updated(a, c + 1)
        case None if b.size < k => b.updated(a, 1L)
        case None => // decrement all, drop zeros (classic MG step)
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
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
