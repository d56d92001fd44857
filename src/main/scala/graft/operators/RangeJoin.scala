package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join, expressed as a bucketed equi-join with a
  * residual predicate — the shape that scales.
  *
  * Spark has no native range-join operator; the naive encoding
  * `points.join(intervals, pt >= start && pt < end)` plans as a
  * BroadcastNestedLoopJoin (fine only while one side broadcasts) or, worse,
  * a cartesian product. Instead each interval is exploded onto the calendar
  * days it covers and each point is mapped to its day, so the join becomes
  * an equi-join on the day bucket (one hash shuffle, AQE-skew-handled) with
  * the exact range check as a residual filter. Interval side grows by its
  * average span in days — bounded and usually tiny next to the fact side.
  *
  * Reference analog: assigning events to campaign/maintenance windows
  * (the reference does per-file date-window bucketing driver-side in
  * run_full_pipeline.py; here it is one distributed join at any scale).
  */
object RangeJoin {

  /** Inner join of `points` (timestamp column `ptsCol`) to `intervals`
    * ([startCol, endCol) timestamp bounds): every (point, interval) match.
    * Buckets at day granularity: correct for any interval span >= 0; spans
    * of many days explode into that many bucket rows on the interval side.
    */
  def pointInInterval(points: DataFrame, ptsCol: String,
      intervals: DataFrame, startCol: String, endCol: String): DataFrame = {
    val p = points.withColumn("_bucket", to_date(col(ptsCol)))
    // sequence() is inclusive; a point exactly at `end` lands in the last
    // bucket but fails the residual `< end` — harmless extra row pre-filter.
    val iv = intervals.withColumn("_bucket",
      explode(sequence(to_date(col(startCol)), to_date(col(endCol)), expr("interval 1 day"))))
    p.join(iv, Seq("_bucket"))
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) < col(endCol))
      .drop("_bucket")
  }
}
