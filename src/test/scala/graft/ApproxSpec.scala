package graft

import org.apache.spark.sql.functions._

/** Approximate-distinct sketch accuracy vs exact counts. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct lands within rsd of exact") {
    val approx = pipeline.DocumentPipeline.approxDistinct(spark, sf)
      .select($"source", $"approx_distinct_texts")
      .as[(String, Long)].collect().toMap
    val exact = Tables.documents(spark, sf)
      .groupBy($"source").agg(countDistinct($"text").as("d"))
      .select($"source", $"d").as[(String, Long)].collect().toMap
    exact.foreach { case (src, d) =>
      val a = approx(src)
      assert(math.abs(a - d) <= math.max(2.0, d * 0.1),
        s"$src: approx $a vs exact $d")
    }
  }
}
