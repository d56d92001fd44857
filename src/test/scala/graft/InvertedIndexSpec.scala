package graft

import org.apache.spark.sql.functions._

/** Inverted-index layout: posting correctness, bucket-pruned term
  * lookups, and AND-search parity with a brute-force scan.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val indexed: Unit =
    operators.InvertedIndex.writeIndex(
      Tables.documents(spark, sf), "postings_idx", buckets = 8)

  test("postings carry exact term frequencies") {
    val docs = Seq((1L, "a b a c"), (2L, "b b b")).toDF("doc_id", "text")
    val got = operators.InvertedIndex.buildPostings(docs)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 2L), ("b", 1L, 1L), ("c", 1L, 1L), ("b", 2L, 3L)))
  }

  test("term lookup prunes to one bucket and pushes the predicate") {
    indexed
    // The auto-bucketed-scan rule would strip the bucketed layout (and
    // with it the pruning) from an exchange-free lookup — serve index
    // queries with it off, as the scaladoc documents.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val one = spark.table("postings_idx").filter($"term" === "the")
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(2000))
      assert(plan.contains("PushedFilters: [IsNotNull(term), EqualTo(term,the)"),
        plan.take(2000))
    } finally spark.conf.set(key, old)
  }

  test("OR-search matches a brute-force corpus scan") {
    indexed
    val terms = Seq("the", "data")
    val got = operators.InvertedIndex
      .orSearch(spark, "postings_idx", terms, k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val brute = Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("toks"))
      .as[(Long, Seq[String])].collect()
      .filter { case (_, toks) => terms.exists(toks.contains) }
      .map { case (id, toks) =>
        (id, terms.count(toks.contains).toLong, toks.count(terms.contains).toLong)
      }
      .sortBy { case (id, m, s) => (-m, -s, id) }
      .take(10).toSeq
    assert(got == brute)
  }

  private lazy val compacted: Unit =
    operators.InvertedIndex.writeCompactIndex(
      Tables.documents(spark, sf), "postings_cidx", buckets = 8, block = 16)

  test("compact index decodes every posting exactly (block-delta round trip)") {
    indexed; compacted
    val allTerms = spark.table("postings_idx")
      .select($"term").distinct().as[String].collect().toSeq
    val got = operators.InvertedIndex
      .lookupCompact(spark, "postings_cidx", allTerms)
      .as[(String, Long, Long)].collect().toSet
    val want = spark.table("postings_idx")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, s"decoded ${got.size} vs flat ${want.size}")
    // compaction really compacts: fewer rows, in-code block bound, and
    // fewer bytes on disk than one row per posting
    val nBlocks = spark.table("postings_cidx").count()
    val nPosts = spark.table("postings_idx").count()
    assert(nBlocks < nPosts, s"$nBlocks blocks vs $nPosts postings")
    assert(spark.table("postings_cidx")
      .select(max(size($"gaps"))).head().getInt(0) <= 16, "block bound")
    def tableBytes(t: String): Long = {
      val wh = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(wh)
    }
    val (cb, fb) = (tableBytes("postings_cidx"), tableBytes("postings_idx"))
    assert(cb < fb, s"compact $cb bytes vs flat $fb bytes")
  }

  test("compact AND-search matches the flat-index AND-search") {
    indexed; compacted
    val terms = Seq("the", "data")
    val flat = operators.InvertedIndex
      .andSearch(spark, "postings_idx", terms, k = 10)
      .as[(Long, Long)].collect().toSeq
    val comp = operators.InvertedIndex
      .andSearchCompact(spark, "postings_cidx", terms, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(comp == flat)
  }

  test("compact term lookup stays bucket-pruned") {
    compacted
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val one = spark.table("postings_cidx").filter($"term" === "the")
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(2000))
    } finally spark.conf.set(key, old)
  }

  test("AND-search matches a brute-force corpus scan") {
    indexed
    val terms = Seq("the", "data")
    val got = operators.InvertedIndex
      .andSearch(spark, "postings_idx", terms, k = 10)
      .as[(Long, Long)].collect().toSeq
    // brute force: docs whose token set contains every term, scored by
    // summed occurrences of the query terms
    val brute = Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("toks"))
      .as[(Long, Seq[String])].collect()
      .filter { case (_, toks) => terms.forall(toks.contains) }
      .map { case (id, toks) => (id, toks.count(terms.contains).toLong) }
      .sortBy { case (id, score) => (-score, id) }
      .take(10).toSeq
    assert(got == brute)
  }

  test("q37 phrase search counts every token-window match, overlaps " +
      "included") {
    val docs = Seq(
      (1L, "x hash join y hash join z"), // two separate matches
      (2L, "hash hash join"),            // one (first hash doesn't start)
      (3L, "hash x join"),               // gap -> no match
      (4L, "join hash"),                 // wrong order -> no match
      (5L, "a a a a")).toDF("doc_id", "text")
    val got = operators.InvertedIndex
      .phraseSearchOf(docs, Seq("hash", "join"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 1L)), got.toString)
    // repeated-word phrase: overlapping starts each count
    val rep = operators.InvertedIndex
      .phraseSearchOf(docs, Seq("a", "a"))
      .as[(Long, Long)].collect().toSeq
    assert(rep == Seq((5L, 3L)), rep.toString)
  }

  test("indexed phrase search matches the inline scan from a " +
      "bucket-pruned positional store") {
    operators.InvertedIndex.writePositionalIndex(
      Tables.documents(spark, sf), "postings_pos_idx", buckets = 8)
    val phrase = Seq("hash", "join")
    val inline = operators.InvertedIndex
      .phraseSearchOf(Tables.documents(spark, sf), phrase)
      .as[(Long, Long)].collect().toSeq
    assert(inline.nonEmpty, "phrase must occur in the corpus")
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val served = operators.InvertedIndex
        .phraseSearchIndexed(spark, "postings_pos_idx", phrase)
      assert(served.as[(Long, Long)].collect().toSeq == inline)
      val plan = spark.table("postings_pos_idx")
        .filter($"term" === "hash").queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        plan.take(2000))
    } finally spark.conf.set(key, old)
  }
}
