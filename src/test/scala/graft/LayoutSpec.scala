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
