package graft

import org.apache.spark.sql.functions._

/** Isolated A/B of d02's banding map side at scale: the r15 fused
  * MinHashBandHashes form vs the former
  * xxhash64(slice(minhash_sig_from_hashes(sh), b*rows+1, rows)) chain,
  * over the same persisted word-shingle frame, measured to the banding
  * aggregate only (the stage the fuse touched). Run:
  * `runMain graft.ProbeD02 /tmp/graftdata/sf10`.
  */
object ProbeD02 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf10")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val bands = 16; val rows = 4

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probed02] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", org.apache.spark.sql.graft.GraftFunctions
        .word_shingle_hashes($"text", 3).as("sh"))
      .filter(size($"sh") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probed02] docs=${docs.count()}")

    // d02c premium decomposition: the adaptive shingle map pass vs d02's,
    // and the density test alone (regex-replace form vs a plain scan).
    for (rep <- 1 to 3) {
      timed(s"word shingles (d02)     $rep") {
        Tables.documents(spark, dir)
          .select($"doc_id", org.apache.spark.sql.graft.GraftFunctions
            .word_shingle_hashes($"text", 3).as("sh"))
          .filter(size($"sh") > 0)
          .select(sum(size($"sh"))).collect()(0).getLong(0)
      }
      timed(s"adaptive shingles (d02c) $rep") {
        operators.Dedup.shingleFrameAdaptive(
            Tables.documents(spark, dir), 6, 0.05)
          .select(sum(size($"sh"))).collect()(0).getLong(0)
      }
      timed(s"ws density regex only   $rep") {
        Tables.documents(spark, dir)
          .select(functions.TextFunctions.whitespaceDensity($"text").as("d"))
          .select(sum($"d")).collect()(0).getDouble(0).toLong
      }
    }

    for (rep <- 1 to 3) {
      timed(s"fused MinHashBandHashes $rep") {
        docs.select($"doc_id",
            posexplode(org.apache.spark.sql.graft.GraftFunctions
              .minhash_band_hashes($"sh", bands, rows)))
          .groupBy($"pos", $"col").count()
          .filter($"count" >= 2).count()
      }
      timed(s"old sig+slice chain    $rep") {
        docs.select($"doc_id",
            org.apache.spark.sql.graft.GraftFunctions
              .minhash_sig_from_hashes($"sh", bands * rows).as("sig"))
          .select($"doc_id", posexplode(array(
            (0 until bands).map(b =>
              xxhash64(slice($"sig", b * rows + 1, rows))): _*)))
          .groupBy($"pos", $"col").count()
          .filter($"count" >= 2).count()
      }
    }
    spark.stop()
  }
}
