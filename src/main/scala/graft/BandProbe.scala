package graft

import org.apache.spark.sql.functions._

/** A/B probe for the candidate-pair stage of the minhash banding
  * machinery at a given SF dir: the former 3-pass shape (stats groupBy
  * + join-back + self-join, variant A) vs the single-shuffle bucket
  * aggregation that replaced it in minhashPairsFromShingles (variant B
  * here uses plain collect_list; production uses CappedCollectLong for
  * bounded hot-bucket state). r14 measurement at sf1, 3 reps each:
  * A 9.8/8.0/6.7 s vs B 4.2/2.8/2.6 s with bit-identical pair sets
  * (4049 = 4049 every rep) — the evidence behind the rewrite.
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val G = org.apache.spark.sql.graft.GraftFunctions

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bandprobe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // d18b's keeper-segment shingle frame, persisted like production
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val meta = operators.Dedup.segmentHashFrame(docs, 10)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    meta.count()
    val keeperOrds = meta.groupBy($"h", $"h2").agg(min($"ord").as("ord")).select($"ord")
    val keepers = meta.join(keeperOrds, Seq("ord"))
      .select($"ord".as("doc_id"), $"sh")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    keepers.count()

    val bands = 16; val rows = 4; val maxBucket = 64
    val shingled = keepers.filter(size($"sh") > 0)
    def banded = shingled
      .select($"doc_id", G.minhash_sig_from_hashes($"sh").as("sig"))
      .select($"doc_id",
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice($"sig", b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    for (rep <- 1 to 3) {
      // A: current shape (stats + join-back + self-join)
      val nA = timed(s"A 3-pass candidates (rep $rep)") {
        val b = banded
        val stats = b.groupBy($"band", $"band_hash")
          .agg(count(lit(1)).as("bucket_n"))
        val bucketed = b.join(
          stats.filter($"bucket_n" >= 2 && $"bucket_n" <= maxBucket),
          Seq("band", "band_hash"))
        val l = bucketed.select($"band", $"band_hash", $"doc_id".as("doc_a"))
        val r = bucketed.select($"band", $"band_hash", $"doc_id".as("doc_b"))
        l.join(r, Seq("band", "band_hash"))
          .filter($"doc_a" < $"doc_b")
          .select($"doc_a", $"doc_b")
          .dropDuplicates("doc_a", "doc_b")
          .count()
      }
      // B: single-shuffle bucket aggregation
      val nB = timed(s"B 1-shuffle candidates (rep $rep)") {
        banded.groupBy($"band", $"band_hash")
          .agg(count(lit(1)).as("n"), collect_list($"doc_id").as("members"))
          .filter($"n" >= 2 && $"n" <= maxBucket)
          .select(explode(G.ordered_pairs(sort_array($"members"))).as("p"))
          .select($"p.a".as("doc_a"), $"p.b".as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
          .count()
      }
      println(s"[bandprobe] pairs A=$nA B=$nB parity=${nA == nB}")
      spark.catalog.clearCache()
      meta.persist(); keepers.persist(); keepers.count()
    }
    spark.stop()
  }
}
