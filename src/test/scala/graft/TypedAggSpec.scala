package graft

import org.apache.spark.sql.functions._
import graft.functions.TypedAggregators

/** Typed Aggregator semantics vs reference computations. */
class TypedAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopK aggregator returns the k largest per group, merged across partitions") {
    val events = Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)]
      .repartition(4)
    val topk = events.groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TypedAggregators.TopK(3).toColumn)
      .collect().toMap
    val expected = Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse.take(3).toSeq).toMap
    expected.foreach { case (k, v) => assert(topk(k) == v, s"type $k") }
  }

  test("LogSumExp matches direct computation and survives extreme values") {
    val xs = Seq(1000.0, 1000.5, 999.0) // naive exp() overflows
    val got = xs.toDS().repartition(2).groupByKey(_ => 1)
      .agg(new TypedAggregators.LogSumExp().toColumn)
      .collect()(0)._2
    val m = xs.max
    val expected = m + math.log(xs.map(x => math.exp(x - m)).sum)
    assert(math.abs(got - expected) < 1e-9)
  }
}
