package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.KeywordSearch
import graft.sources.{IncrementalIngest, Layout}

/** Storage layout: bucketed join without exchange, partition pruning,
  * store compaction.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    Layout.writeBucketed(
      Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice"),
      "orders_b", "o_orderkey")
    Layout.writeBucketed(
      Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity"),
      "lineitem_b", "l_orderkey")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("date-partitioned writes prune partitions on read") {
    val out = Files.createTempDirectory("graft_part_").toString + "/events"
    Layout.writeDatePartitioned(Tables.events(spark, sf), out, "ts")
    val pruned = spark.read.parquet(out).filter($"_date" === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(_date"),
      s"expected partition filter in:\n$plan")
    // correctness: matches an unpartitioned filter on the same day
    val expected = Tables.events(spark, sf)
      .filter(date_format($"ts", "yyyy-MM-dd") === "2024-01-05").count()
    assert(pruned.count() == expected)
  }

  test("compaction preserves content and uniqueness while cutting file count") {
    val store = Files.createTempDirectory("graft_cstore_").toString
    for (i <- 1 to 6)
      IncrementalIngest.appendBatch(
        Seq((i.toLong, s"unique content number $i")).toDF("doc_id", "text"),
        store, f"b$i%04d")
    val before = new java.io.File(store).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 6)
    val n = Layout.compactStore(spark, store, target = 2)
    assert(n == 6)
    val after = spark.read.parquet(store + "/*.parquet")
    assert(after.count() == 6)
    assert(after.select("content_hash").distinct().count() == 6)
    val audit = IncrementalIngest.audit(spark, store).collect()(0)
    assert(audit.getAs[Long]("duplicate_count") == 0)
  }

  test("compactBucketedTable: a crash planted in every swap window " +
      "recovers at open (VERDICT r17 #3)") {
    def fresh(name: String): Seq[org.apache.spark.sql.Row] = {
      Seq(name, s"${name}_compact_tmp", s"${name}_compact_old")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Layout.writeBucketed(
        (1L to 100L).toDF("k").withColumn("v", $"k" * 2), name, "k",
        buckets = 4)
      spark.table(name).orderBy("k").collect().toSeq
    }
    def content(t: String) = spark.table(t).orderBy("k").collect().toSeq
    def mkTmp(name: String): Unit =
      spark.table(name).write.bucketBy(4, "k").sortBy("k")
        .format("parquet").saveAsTable(s"${name}_compact_tmp")

    // window 1: tmp landed, crash BEFORE rename-aside → original is live;
    // recovery drops the (possibly half-written) tmp and touches nothing
    val w1 = fresh("rcv_w1"); mkTmp("rcv_w1")
    assert(Layout.recoverCompaction(spark, "rcv_w1").exists(_.contains("stale")))
    assert(content("rcv_w1") == w1)
    assert(!spark.catalog.tableExists("rcv_w1_compact_tmp"))

    // window 2: crash BETWEEN rename-aside and promote → live name absent,
    // complete tmp + original-as-old both present; recovery promotes tmp
    val w2 = fresh("rcv_w2"); mkTmp("rcv_w2")
    spark.sql("ALTER TABLE rcv_w2 RENAME TO rcv_w2_compact_old")
    assert(!spark.catalog.tableExists("rcv_w2"))
    assert(Layout.recoverCompaction(spark, "rcv_w2").exists(_.contains("promoted")))
    assert(content("rcv_w2") == w2)
    assert(!spark.catalog.tableExists("rcv_w2_compact_old"))
    // the promoted table keeps its bucket spec: a follow-up compaction
    // still resolves it (would sys.error on a de-bucketed table)
    val (_, after2) = Layout.compactBucketedTable(spark, "rcv_w2")
    assert(after2 == 4L && content("rcv_w2") == w2)

    // window 3: crash AFTER promote, before the old copy dropped →
    // live table already the compacted one; recovery just drops old
    val w3 = fresh("rcv_w3"); mkTmp("rcv_w3")
    spark.sql("ALTER TABLE rcv_w3 RENAME TO rcv_w3_compact_old")
    spark.sql("ALTER TABLE rcv_w3_compact_tmp RENAME TO rcv_w3")
    assert(Layout.recoverCompaction(spark, "rcv_w3").exists(_.contains("stale")))
    assert(content("rcv_w3") == w3)
    assert(!spark.catalog.tableExists("rcv_w3_compact_old"))

    // rollback: live absent and no tmp (shouldn't arise under the swap
    // order, but recovery still restores the original)
    val w4 = fresh("rcv_w4")
    spark.sql("ALTER TABLE rcv_w4 RENAME TO rcv_w4_compact_old")
    assert(Layout.recoverCompaction(spark, "rcv_w4").exists(_.contains("rolled back")))
    assert(content("rcv_w4") == w4)

    // a healthy table needs no recovery
    fresh("rcv_ok")
    assert(Layout.recoverCompaction(spark, "rcv_ok").isEmpty)
  }

  test("index probes recover a mid-swap crashed index table at open " +
      "(the gate-restart path)") {
    Seq("rcv_idx_bands", "rcv_idx_shingles", "rcv_idx_bands_compact_tmp",
      "rcv_idx_bands_compact_old")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely different document about spark physical planning"))
      .toDF("doc_id", "text")
    operators.Dedup.writeDedupIndex(docs, "rcv_idx")
    // plant the worst window on the bands table: live name absent,
    // complete tmp + old present — a gate restarting here formerly
    // needed manual surgery
    spark.table("rcv_idx_bands").write.bucketBy(8, "band_hash")
      .sortBy("band_hash").format("parquet")
      .saveAsTable("rcv_idx_bands_compact_tmp")
    spark.sql("ALTER TABLE rcv_idx_bands RENAME TO rcv_idx_bands_compact_old")
    assert(!spark.catalog.tableExists("rcv_idx_bands"))
    // the probe entry point recovers, then finds the planted duplicate
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val dups = operators.Dedup.dedupDelta(spark, "rcv_idx", delta).collect()
    assert(spark.catalog.tableExists("rcv_idx_bands"))
    assert(!spark.catalog.tableExists("rcv_idx_bands_compact_tmp"))
    assert(dups.length == 1 && dups(0).getLong(0) == 1L &&
      dups(0).getLong(1) == 10L)
  }

  test("a probe sees another session's compaction without manual refresh " +
      "(ADVICE r17: cross-session staleness absorbed at probe open)") {
    Seq("xs_idx_bands", "xs_idx_shingles")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val mk = (ids: Seq[Long]) => ids.map(i =>
      (i, (0 until 30).map(j => s"tok${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    operators.Dedup.writeDedupIndex(mk(1L to 20L), "xs_idx")
    operators.Dedup.appendDedupIndex(mk(21L to 40L), "xs_idx")
    // prime THIS session's relation cache so its file listing is
    // genuinely stale after the other session rewrites the files
    spark.table("xs_idx_bands").count()
    spark.table("xs_idx_shingles").count()
    // compact through a CLONE — the documented between-batches pattern:
    // the stream's foreachBatch session is not the analyst's session,
    // and Spark has no cross-session relation-cache invalidation
    val other = spark.newSession()
    val compacted = operators.Dedup.compactIndex(other, "xs_idx")
    assert(compacted.nonEmpty, "append must have left something to compact")
    // probe in the ORIGINAL session with NO manual refreshTable: the
    // open-time indexRecoverAndRefresh must absorb the rewrite (before
    // r18 this path could throw FileNotFound on the stale listing)
    val delta = mk(Seq(1000L)).union(mk(Seq(21L))
      .select(lit(2000L).as("doc_id"), $"text"))
    val dups = operators.Dedup.dedupDelta(spark, "xs_idx", delta)
      .collect()
    assert(dups.map(_.getLong(1)).toSet == Set(2000L),
      s"probe after cross-session compaction must still find exactly " +
        s"the planted dup: ${dups.mkString(",")}")
    Seq("xs_idx_bands", "xs_idx_shingles")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("semanticDelta follows a cross-session reindex that changed the " +
      "plane count (the _vecmeta staleness the r18 self-review found)") {
    Seq("xs_sem_vecs", "xs_sem_vecmeta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val corpus = GenCorpus.generateEmbeddings(spark, 400)
    operators.Dedup.writeSemanticIndex(corpus, "xs_sem", planes = 12)
    // probes are EXACT copies of 10 corpus vectors under fresh ids: an
    // exact copy always shares its source's bucket WITHIN one plane
    // family, but a 12-plane signature and a 14-plane signature of the
    // same vector are different bucket values — so probing with a stale
    // plane count yields ZERO hits, which is exactly the silent failure
    // mode being pinned
    val probe = corpus.filter($"vec_id" < 10)
      .select(($"vec_id" + 5000L).as("vec_id"), $"embedding")
    assert(operators.Dedup
      .semanticDelta(spark, "xs_sem", probe, minCos = 0.999).count() >= 10,
      "pre-reindex probe must hit its exact sources")
    // ANOTHER session reindexes the same corpus with a different family:
    // both _vecs and _vecmeta are Overwritten — files replaced under
    // this session's cached listings
    val other = spark.newSession()
    operators.Dedup.writeSemanticIndex(
      GenCorpus.generateEmbeddings(other, 400), "xs_sem", planes = 14)
    // probe from the ORIGINAL session: the open-time refresh must cover
    // the _vecmeta sidecar too, so the probe addresses the NEW 14-plane
    // family (the pre-fix catch-all fallback silently probed p=12 -> 0
    // hits, every near-dup admitted)
    val got = operators.Dedup
      .semanticDelta(spark, "xs_sem", probe, minCos = 0.999).count()
    assert(got >= 10,
      s"post-reindex probe must address the new plane family, hits=$got")
    Seq("xs_sem_vecs", "xs_sem_vecmeta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("keyword store prefix search prunes to one partition and pushes the predicate") {
    val out = Files.createTempDirectory("graft_kws_").toString + "/keywords"
    val stats = Seq(
      ("alpha", 5L), ("apple", 9L), ("apply", 9L), ("append", 2L),
      ("banana", 7L), ("batch", 3L), ("remote", 4L), ("remove", 4L),
      ("render", 8L), ("retry", 1L)).toDF("keyword", "n_docs")
    KeywordSearch.writeKeywordStore(stats, out)
    val top = KeywordSearch.prefixTopK(spark, out, "ap", k = 3)
    val plan = top.queryExecution.executedPlan.toString
    // trie level 1 = hive partition: only the k1=a directory is scanned
    assert(plan.contains("PartitionFilters: [isnotnull(k1"),
      s"expected first-char partition pruning in:\n$plan")
    // trie descent below level 1 = pushed range predicate on the sorted key
    assert(plan.contains("StringStartsWith(keyword,ap)"),
      s"expected pushed prefix predicate in:\n$plan")
    // top-k is per-partition k + merge, not a global sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    // count-desc, keyword-asc tie-break — the trie's search() ordering
    assert(top.as[(String, Long)].collect().toSeq ==
      Seq(("apple", 9L), ("apply", 9L), ("append", 2L)))
  }

  test("z-ordered layout is file-prunable on BOTH dimensions; a single-" +
      "column sort is blind on the second") {
    val ev = Tables.events(spark, sf).select($"user_id", $"value", $"event_id")
    val zDir = Files.createTempDirectory("graft_z_").toString + "/ev"
    val sDir = Files.createTempDirectory("graft_s_").toString + "/ev"
    Layout.writeZOrdered(ev, zDir, "user_id", "value", files = 16)
    // the contrast layout: perfectly sorted on user_id only
    ev.repartitionByRange(16, $"user_id").sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(sDir)

    // Per-file min/max of each dimension IS what row-group skipping sees:
    // count the files a narrow predicate on that dimension cannot skip.
    def overlapping(dir: String, c: String, lo: Double, hi: Double): Int =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).count { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
          r.getDouble(0) <= hi && r.getDouble(1) >= lo
        }
    val stats = ev.agg(
      min($"user_id").cast("double"), max($"user_id").cast("double"),
      min($"value").cast("double"), max($"value").cast("double")).head()
    def narrow(lo: Double, hi: Double) = {
      val w = (hi - lo) / 16.0; (lo + 7 * w, lo + 8 * w) // one-16th slice
    }
    val (ulo, uhi) = narrow(stats.getDouble(0), stats.getDouble(1))
    val (vlo, vhi) = narrow(stats.getDouble(2), stats.getDouble(3))

    // user_id: the sorted layout is perfect (~1 file); z-order must still
    // prune meaningfully (strictly fewer than half the files).
    assert(overlapping(zDir, "user_id", ulo, uhi) <= 8,
      "z-order must prune on the first dimension")
    // value: the sorted layout is blind — every file overlaps; z-order
    // must beat it decisively.
    val sortedV = overlapping(sDir, "value", vlo, vhi)
    val zV = overlapping(zDir, "value", vlo, vhi)
    assert(sortedV >= 12, s"single-column sort should be blind on value: $sortedV")
    assert(zV <= sortedV / 2, s"z-order must prune on value too: $zV vs $sortedV")

    // correctness: the clustered copy is the same multiset of rows
    assert(spark.read.parquet(zDir).orderBy($"event_id").collect().toSeq ==
      ev.orderBy($"event_id").collect().toSeq)
  }
}
