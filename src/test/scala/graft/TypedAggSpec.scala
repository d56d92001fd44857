package graft

import org.apache.spark.sql.functions._
import graft.functions.TypedAggregators

/** Typed Aggregator semantics vs reference computations. */
class TypedAggSpec extends SparkSpec {
  import spark.implicits._

  test("HeavyHitters: guaranteed capture above N/k, bounded undercount, exact when vocab <= k") {
    val agg = new TypedAggregators.HeavyHitters(8)
    // adversarial stream: vocab (26) > k (8); 'hot' appears 40/170 times
    val stream = (0 until 130).map(i => ('a' + i % 26).toChar.toString) ++
      Seq.fill(40)("hot")
    val n = stream.size
    // split into shards, reduce each, merge in a fixed order
    val sketch = stream.grouped(20)
      .map(sh => sh.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    assert(sketch.contains("hot"), "freq > N/k item must survive")
    val err = 40L - sketch("hot")
    assert(err >= 0 && err <= n / 8, s"undercount $err outside bound")
    // degenerate regime: vocab <= k → exact counts
    val exactAgg = new TypedAggregators.HeavyHitters(64)
    val sketch2 = stream.grouped(20)
      .map(sh => sh.foldLeft(exactAgg.zero)(exactAgg.reduce))
      .reduce(exactAgg.merge)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(sketch2 == truth)
  }

  test("VectorMean equals the exploded per-dimension average") {
    val vecMean = udaf(new TypedAggregators.VectorMean,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    val emb = Tables.embeddings(spark, sf)
      .select($"label", graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val viaAgg = emb.groupBy($"label").agg(vecMean($"v").as("c"))
      .select($"label", posexplode($"c"))
      .select($"label", $"pos", round($"col", 9).as("m"))
      .as[(Int, Int, Double)].collect().toSet
    val viaExplode = emb.select($"label", posexplode($"v"))
      .groupBy($"label", $"pos").agg(round(avg($"col"), 9).as("m"))
      .as[(Int, Int, Double)].collect().toSet
    assert(viaAgg == viaExplode)
  }

  test("QuantileHistogram: within bin width of exact percentiles; partition-order invariant") {
    val qh = new TypedAggregators.QuantileHistogram(0.0, 600.0, 256)
    val binWidth = 600.0 / 256
    val sketch = udaf(qh, org.apache.spark.sql.Encoders.scalaDouble)
    val ev = Tables.events(spark, sf)
    val got = ev.groupBy($"event_type").agg(sketch($"value").as("h"))
      .select($"event_type", $"h").as[(String, Seq[Long])]
      .collect().toMap
    val exact = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .as[(String, Double, Double)].collect()
    exact.foreach { case (t, p50, p90) =>
      val h = got(t).toArray
      assert(math.abs(qh.quantile(h, 0.5) - p50) <= binWidth,
        s"$t p50: ${qh.quantile(h, 0.5)} vs $p50")
      assert(math.abs(qh.quantile(h, 0.9) - p90) <= binWidth,
        s"$t p90: ${qh.quantile(h, 0.9)} vs $p90")
    }
    // merge-order invariance: 1-partition result == 32-partition result
    val one = ev.repartition(1).agg(sketch($"value")).head().getSeq[Long](0)
    val many = ev.repartition(32).agg(sketch($"value")).head().getSeq[Long](0)
    assert(one == many)
  }

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
