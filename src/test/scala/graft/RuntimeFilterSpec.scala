package graft

import org.apache.spark.sql.functions._

/** At 100 TB the orders side of the q15 fact-fact join no longer
  * broadcasts; Spark's runtime bloom filter (InjectRuntimeFilter) then
  * prunes lineitem rows before the shuffle. The thresholds that gate the
  * rewrite are sized for clusters (10 GB application-side scans), so this
  * spec lowers them to prove the plan shape the engine relies on at scale.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter is injected on the shuffled fact-fact join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter($"o_orderstatus" === "F")
      val q = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag").agg(count(lit(1)))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloom"),
        s"expected a bloom runtime filter in:\n$optimized")
      // and the filtered plan still computes the right answer
      val expect = li.join(o, $"l_orderkey" === $"o_orderkey")
        .count()
      assert(q.agg(sum("count(1)")).as[Long].head() == expect)
    }
  }
}
