package graft

import org.apache.spark.sql.functions._

/** Scratch decomposition of d18b's stage walls at a given SF dir —
  * measure-first (r14 discipline) before touching the p07-dominant
  * segment stage. Each leg forces exactly one additional pipeline
  * stage; legs run twice so the second rep separates cold-IO from
  * compute. Run: `runMain graft.ProbeD18 /tmp/graftdata/sf10`.
  */
object ProbeD18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf10")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d18probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (rep <- 1 to 2) {
      println(s"[d18probe] === rep $rep")
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      val meta = operators.Dedup.segmentHashFrame(docs, 10)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nSeg = t("meta materialize")(meta.count())
      val keeperOrds = meta.groupBy($"h", $"h2").agg(min($"ord").as("ord"))
        .select($"ord")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nKeep = t("keeper groupBy")(keeperOrds.count())
      val exactDups = meta.join(keeperOrds, Seq("ord"), "left_anti")
        .select($"ord")
      t("exact anti-join")(exactDups.count())
      val keepers = meta.join(keeperOrds, Seq("ord"))
        .select($"ord".as("doc_id"), $"sh")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("keeper shingle join")(keepers.count())
      // A/B (r15): ONE-PASS keeper aggregation — min_by carries the
      // shingle arrays through the (h,h2) shuffle, replacing keeper
      // groupBy + the ord-join that re-shuffles meta(ord, sh); exact
      // dups then come from a light (h,h2) join against the kept ords.
      // Volumes are near-equal (sh travels one corpus shuffle either
      // way; partial agg only collapses the ~6% duplicate segments), so
      // this measures exchanges saved vs agg-buffer cost.
      val ka = meta.groupBy($"h", $"h2")
        .agg(min($"ord").as("kord"), min_by($"sh", $"ord").as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("MIN_BY keeper one-pass")(ka.count())
      t("MIN_BY exact-dup join")(meta.select($"ord", $"h", $"h2")
        .join(ka.select($"h", $"h2", $"kord"), Seq("h", "h2"))
        .filter($"ord" =!= $"kord").count())
      ka.unpersist()
      val banded = keepers
        .select($"doc_id", org.apache.spark.sql.graft.GraftFunctions
          .minhash_sig_from_hashes($"sh").as("sig"))
        .select($"doc_id", posexplode(transform(sequence(lit(0), lit(15)),
          b => xxhash64(slice($"sig", b.cast("int") * 4 + 1, lit(4))))))
      val buckets = banded.groupBy($"pos", $"col")
        .agg(org.apache.spark.sql.graft.GraftFunctions
          .capped_collect_long($"doc_id", 65).as("cb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("sig+band+capped groupBy")(buckets.count())
      // A/B: the fused one-pass band-hash expression feeding the same
      // capped groupBy (bit-identity is DedupSpec-pinned; this measures)
      val bucketsF = keepers
        .select($"doc_id", posexplode(org.apache.spark.sql.graft
          .GraftFunctions.minhash_band_hashes($"sh", 16, 4)))
        .groupBy($"pos", $"col")
        .agg(org.apache.spark.sql.graft.GraftFunctions
          .capped_collect_long($"doc_id", 65).as("cb"))
      t("FUSED band+capped groupBy")(bucketsF.count())
      val allPairs = buckets
        .filter($"cb.n" >= 2 && $"cb.n" <= 64)
        .select(explode(org.apache.spark.sql.graft.GraftFunctions
          .ordered_pairs(sort_array($"cb.members"))).as("p"))
        .select($"p.a".as("doc_a"), $"p.b".as("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("pair explode+dedup")(allPairs.count())
      val withSh = allPairs
        .join(keepers.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
        .join(keepers.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
      val ni = org.apache.spark.sql.graft.GraftFunctions
        .sorted_intersection_size($"sh_a", $"sh_b")
      val nearPairs = withSh
        .withColumn("jaccard",
          round(ni.cast("double") / (size($"sh_a") + size($"sh_b") - ni), 6))
        .filter($"jaccard" >= 0.5)
        .select($"doc_a", $"doc_b")
      t("verify joins")(nearPairs.count())
      val ords = exactDups
        .unionByName(nearPairs.select($"doc_b".as("ord"))).distinct()
      t("ord union distinct")(ords.count())
      println(s"[d18probe] nSeg=$nSeg nKeepers=$nKeep")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
