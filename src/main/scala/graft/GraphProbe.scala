package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A/B probe for g02b's per-supplier customer-hash array build (VERDICT
  * r14 #3): variant A is the arrays-derived shape (customerArrays by ck,
  * then explode + regroup by sk); variant B is the verdict-suggested
  * anti-join rewrite (partial-agg'd over-fan counts broadcast as an
  * anti-join, then ONE direct groupBy(sk)). Both feed the identical
  * band/verify pipeline; the probe pins bit-identical arrays and full
  * pair sets (pre-top-k) plus wall per rep, then times the production
  * g02b end-to-end. MEASURED (sf10, r15): B is 2-3× slower — its fan
  * side rebuilds orders⋈lineitem a second time and countDistinct pays a
  * two-exchange distinct rewrite — so production kept A and moved the
  * arrays pass into the memoized [[graft.operators.Graph.tradeArraysTable]]
  * instead. Run: `runMain graft.GraphProbe /tmp/graftdata/sf1`.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[graphprobe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val maxFan = 64; val minJaccard = 0.2
    val bands = 32; val rows = 2; val maxBucket = 64
    def pairsRaw = operators.Graph.tradePairsRaw(spark, dir)

    // Full (pre-top-k) verified pair set from a supCust variant — eager,
    // caches released, so each rep is self-contained.
    def pairsFrom(supCust: DataFrame): (Long, DataFrame) = {
      val sc = supCust.persist(StorageLevel.MEMORY_AND_DISK)
      val out = operators.Dedup.minhashPairsFromShingles(
          sc.select($"sk".as("doc_id"), $"sh"), bands, rows, maxBucket,
          minJaccard)
        .select($"doc_a".as("sk_a"), $"doc_b".as("sk_b"), $"jaccard")
        .localCheckpoint(true)
      sc.unpersist()
      (out.count(), out)
    }

    for (rep <- 1 to 3) {
      val (nA, pA) = timed(s"A 2-shuffle supCust -> pairs (rep $rep)") {
        pairsFrom(operators.Graph.customerArrays(pairsRaw)
          .filter(size($"sks") <= maxFan)
          .select($"ck", explode($"sks").as("sk"))
          .groupBy($"sk")
          .agg(sort_array(collect_set(xxhash64($"ck"))).as("sh")))
      }
      val (nB, pB) = timed(s"B 1-shuffle supCust -> pairs (rep $rep)") {
        val overFan = pairsRaw.groupBy($"ck")
          .agg(countDistinct($"sk").as("fan"))
          .filter($"fan" > maxFan)
          .select($"ck")
        pairsFrom(pairsRaw
          .join(broadcast(overFan), Seq("ck"), "left_anti")
          .groupBy($"sk")
          .agg(sort_array(collect_set(xxhash64($"ck"))).as("sh")))
      }
      val diff = pA.exceptAll(pB).count() + pB.exceptAll(pA).count()
      println(s"[graphprobe] pairs A=$nA B=$nB symmdiff=$diff " +
        s"parity=${diff == 0 && nA == nB}")
      spark.catalog.clearCache()
    }

    // Array-level parity: on a dense corpus the bucket cap can prune the
    // PAIR set to zero (making pair parity vacuous), but the supCust
    // arrays are the full operator state — bit-identical arrays imply an
    // identical sketch pipeline at any downstream setting.
    {
      val a = operators.Graph.customerArrays(pairsRaw)
        .filter(size($"sks") <= maxFan)
        .select($"ck", explode($"sks").as("sk"))
        .groupBy($"sk")
        .agg(sort_array(collect_set(xxhash64($"ck"))).as("sh"))
      val overFan = pairsRaw.groupBy($"ck")
        .agg(countDistinct($"sk").as("fan"))
        .filter($"fan" > maxFan)
        .select($"ck")
      val b = pairsRaw
        .join(broadcast(overFan), Seq("ck"), "left_anti")
        .groupBy($"sk")
        .agg(sort_array(collect_set(xxhash64($"ck"))).as("sh"))
      val arrDiff = a.exceptAll(b).count() + b.exceptAll(a).count()
      println(s"[graphprobe] supCust rows A=${a.count()} B=${b.count()} " +
        s"symmdiff=$arrDiff parity=${arrDiff == 0}")
      spark.catalog.clearCache()
    }

    for (rep <- 1 to 3) timed(s"g02b end-to-end production (rep $rep)") {
      operators.Graph.copurchaseSketch(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
