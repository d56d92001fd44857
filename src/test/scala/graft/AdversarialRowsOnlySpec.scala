package graft

import org.apache.spark.sql.functions._

/** Verdict r16 #1: the oracle gate's one remaining blind spot was the
  * rows-only (no-DuckDB-oracle) operator family — hash-seeded banding,
  * sketches, ANN search, media decode, the curation DAG — which had only
  * ever seen clean planted spec corpora. This suite drives the FULL
  * GenAdversarial hostile corpus (NULL/empty/whitespace text, unsegmented
  * CJK, 40×-exact mass, metacharacters, zero/negated/1e30/NULL-component
  * vectors, null/non-finite events, dangling-FK relational rows) through
  * every rows-only key and pins each family's divergence classes:
  * no crashes, bit-determinism, null-safety, and the family-specific
  * contracts (d19b↔d19 row parity, d02c CJK recall, sketch bounds,
  * corrupt-payload codec fallback).
  */
class AdversarialRowsOnlySpec extends SparkSpec {
  import spark.implicits._

  /** The declared rows-only set (CORRECTNESS no_oracle + p07b). */
  private val rowsOnlyKeys = Seq(
    "d02_dedup_minhash", "d02c_minhash_adaptive", "d03_dedup_simhash",
    "d17_source_sketch_overlap", "d18b_segment_neardup_full",
    "d19b_substring_fast", "e09_quantile_sketch", "g02b_copurchase_sketch",
    "m01_multimodal_meta", "m03_frame_resize_plan", "m06_phash_neardup",
    "m07_media_canonical", "p01_corpus_curate", "p07_curation_dag",
    "p07b_curation_substring", "s02_knn_lsh", "s02b_knn_multiprobe",
    "s04_knn_ivf", "s05_knn_quantized", "s06_knn_pq", "t06_approx_distinct",
    "t10_winnow_fingerprint", "t13_heavy_hitters", "t25_bpe_tokens")

  /** Hostile-table directory, built once for the suite. */
  private lazy val advDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_advspec_").toString
    GenAdversarial.writeAll(spark, dir, sf)
    dir
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    // stage_sec is wall-clock observability (p07's waterfall), not data
    val d = if (df.columns.contains("stage_sec")) df.drop("stage_sec") else df
    d.collect().map(_.toString).sorted.toSeq
  }

  test("every rows-only operator survives the hostile corpus and is " +
      "bit-deterministic on it") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    rowsOnlyKeys.foreach { k =>
      try {
        val a = canon(SparkEntry.queries(k)(spark, advDir))
        spark.catalog.clearCache()
        val b = canon(SparkEntry.queries(k)(spark, advDir))
        spark.catalog.clearCache()
        if (a != b) failures += s"$k: nondeterministic (${a.size} vs ${b.size} rows)"
      } catch {
        case e: Throwable =>
          failures += s"$k: CRASH ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(200)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("d02/d02c on hostile text: degenerate docs never pair; the " +
      "script-adaptive family recovers the CJK near-dup d02 cannot see") {
    val degenerate = (1000L to 1002L) ++ (1100L to 1102L) ++
      (1200L to 1204L) ++ (1300L to 1303L) // null, empty, whitespace, single
    val d02 = graft.operators.Dedup.dedupMinhash(spark, advDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val d02c = graft.operators.Dedup.dedupMinhashAdaptive(spark, advDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    Seq("d02" -> d02, "d02c" -> d02c).foreach { case (n, pairs) =>
      assert(!pairs.exists(p =>
        degenerate.contains(p._1) || degenerate.contains(p._2)),
        s"$n paired a NULL/empty/whitespace/single-token doc")
    }
    // the ±1-char unsegmented CJK pair (1600, 1601): invisible to word
    // shingling (one "word"), recovered by the char-gram fallback
    assert(!d02.contains((1600L, 1601L)),
      "word shingling cannot see inside an unsegmented CJK doc")
    assert(d02c.contains((1600L, 1601L)),
      s"script-adaptive family must flag the CJK near-dup pair, got " +
        s"${d02c.filter(p => p._1 >= 1600 && p._1 < 1700).mkString(",")}")
  }

  test("d03 simhash on hostile text: degenerate docs never pair; the " +
      "40x exact-mass family collapses without flooding") {
    val pairs = graft.operators.Dedup.dedupSimhash(spark, advDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val degenerate = (1000L to 1002L) ++ (1100L to 1102L) ++ (1200L to 1204L)
    assert(!pairs.exists(p =>
      degenerate.contains(p._1) || degenerate.contains(p._2)),
      "simhash paired a contentless doc")
    // 40 byte-identical docs share one simhash: either the bucket cap
    // prunes the flood or the pairs are complete — never a partial,
    // order-dependent subset. Pin whichever contract holds.
    val mass = pairs.filter(p => p._1 >= 1400L && p._1 < 1440L &&
      p._2 >= 1400L && p._2 < 1440L)
    assert(mass.isEmpty || mass.length == 40 * 39 / 2,
      s"exact-mass family must be all-or-nothing under the cap, " +
        s"got ${mass.length} pairs")
  }

  test("d19b on hostile text: row parity with oracled d19 holds under " +
      "nulls, CJK, metacharacters, and the 40x run mass") {
    val d19 = canon(SparkEntry.queries("d19_substring_dedup")(spark, advDir))
    val d19b = canon(SparkEntry.queries("d19b_substring_fast")(spark, advDir))
    assert(d19 == d19b,
      s"d19b must stay row-identical to d19 on hostile input " +
        s"(${d19.size} vs ${d19b.size} rows)")
  }

  test("d17 sketch overlap on hostile sources tracks the EXACT distinct-" +
      "shingle overlap within sketch error") {
    // exact per-source distinct shingle sets + exact pair overlaps,
    // computed directly (the brute-force d17 oracle)
    val sh = Tables.documents(spark, advDir)
      .select($"source", explode(org.apache.spark.sql.graft.GraftFunctions
        .word_shingle_hashes($"text", 3)).as("h"))
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).map { case (s0, rs) => s0 -> rs.map(_._2).toSet }
    val approx = SparkEntry.queries("d17_source_sketch_overlap")(spark, advDir)
      .select($"src_lo", $"src_hi", $"est_overlap")
      .as[(String, String, Long)].collect()
    val bad = approx.flatMap { case (a, b, est) =>
      (sh.get(a), sh.get(b)) match {
        case (Some(sa), Some(sb)) =>
          val n = (sa intersect sb).size
          // inclusion-exclusion error is ABSOLUTE in the set sizes (HLL
          // rsd ~1.6% of each of |A|, |B|, |A∪B| at lgK=12), so the
          // bound scales with |A|+|B| — on the hostile corpus's small
          // overlaps the relative error is legitimately huge, which is
          // exactly d17's documented triage-not-verdict contract
          val tol = math.max(n * 0.2, 0.05 * (sa.size + sb.size))
          if (math.abs(est - n) > tol)
            Some(s"($a,$b): exact $n est $est (|A|=${sa.size} |B|=${sb.size})")
          else None
        case _ => None
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("s-family on hostile embeddings: zero/1e30/negated/NULL-component " +
      "vectors neither crash nor rank, LSH candidates stay exact-verified") {
    // s01 (oracled) is the reference: no degenerate vector may appear as
    // a neighbor with a non-finite or null similarity
    val s02 = SparkEntry.queries("s02_knn_lsh")(spark, advDir)
      .select($"query_id", $"neighbor_id", $"sim")
      .as[(Long, Long, Double)].collect()
    assert(s02.forall(r => !r._3.isNaN && !r._3.isInfinite),
      "LSH re-rank must never emit a NaN/Inf similarity")
    assert(s02.forall(r => r._2 != 1000L && r._2 != 1008L),
      "the zero vector and the NULL-component vector must never rank " +
        "(their cosine is undefined)")
    val s05 = SparkEntry.queries("s05_knn_quantized")(spark, advDir)
      .select($"neighbor_id", $"sim").as[(Long, Double)].collect()
    assert(s05.forall(r => !r._2.isNaN && !r._2.isInfinite),
      "quantized search must survive the degenerate magnitudes")
    // IVF + PQ: training over the hostile store (zero vector, 1e30
    // magnitudes, NULL-component) must converge and serve k results per
    // query — the crash/NaN-centroid path is what this pins
    Seq("s04_knn_ivf", "s06_knn_pq").foreach { k =>
      val got = SparkEntry.queries(k)(spark, advDir)
      val perQuery = got.groupBy(got.columns.head)
        .count().select($"count").as[Long].collect()
      assert(perQuery.nonEmpty && perQuery.forall(_ >= 1),
        s"$k must return ranked neighbors for every query on the " +
          "hostile store")
    }
  }

  test("m-family codec fallback: corrupt image/audio payloads (valid " +
      "magic, garbage body) fall to the deterministic stub, never crash") {
    import graft.multimodal.Multimodal
    // valid PNG magic + garbage; valid RIFF/WAVE header + garbage
    val fakePng = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47) ++
      Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val fakeWav = "RIFF1234WAVE".getBytes("UTF-8") ++
      Array.tabulate[Byte](64)(i => (i * 11).toByte)
    val media = Seq(
      (9000L, "image", fakePng, fakePng.length.toLong, "h0"),
      (9001L, "audio", fakeWav, fakeWav.length.toLong, "h1"),
      (9002L, "video", Array.emptyByteArray, 0L, "h2")) // empty payload
      .toDF("doc_id", "kind", "payload", "n_bytes", "content_hash")
    val feats = Multimodal.decodeFeaturesOf(media).collect()
    assert(feats.length == 3, "every corrupt payload decodes via the stub")
    assert(feats.forall(_.getAs[Int]("width") >= 64),
      "stub features must be well-formed")
    // the near-dup and canonical stages run over the corrupt payloads too
    assert(Multimodal.phashNearDupOf(media).collect().forall(r =>
      r.getAs[Int]("hamming") >= 0))
    val canon9 = Multimodal.mediaCanonicalOf(media).collect()
    assert(canon9.length == 3 && canon9.forall(_.getAs[Boolean]("is_canonical")),
      "unrelated corrupt payloads are their own canonicals")
  }

  test("e09/t13 sketches on hostile input: sketch outputs materialize " +
      "and Misra-Gries estimates respect the undercount bound") {
    // e09 over hostile events (loader contract: non-finite values nulled,
    // null ts dead-lettered) — materializes, bounded row count
    val est = SparkEntry.queries("e09_quantile_sketch")(spark, advDir)
    assert(est.count() >= 1, "sketch output present on hostile events")
    // t13 (Misra-Gries k=256, top 10 corpus tokens): every reported
    // estimate obeys true_count - N/k <= est <= true_count — the bound
    // the 40x exact-mass + 5000-token-doc families stress
    val truth = Tables.documents(spark, advDir)
      .filter($"text".isNotNull)
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").count().as[(String, Long)].collect().toMap
    val n = truth.values.sum
    val reported = SparkEntry.queries("t13_heavy_hitters")(spark, advDir)
      .select($"keyword", $"est_count").as[(String, Long)].collect()
    assert(reported.nonEmpty)
    val bad = reported.flatMap { case (w, e) =>
      val t = truth.getOrElse(w, 0L)
      if (e > t || e < t - n / 256) Some(s"$w: est $e true $t") else None
    }
    assert(bad.isEmpty, s"undercount bound violated: ${bad.mkString(", ")}")
  }

  test("t06/t10/t25 on hostile text: distinct estimate materializes, " +
      "winnowing reports 0 fingerprints for contentless docs, BPE trains") {
    val est = SparkEntry.queries("t06_approx_distinct")(spark, advDir)
    assert(est.count() >= 1)
    // winnow: NULL-text docs report ZERO fingerprints (the size(NULL)=-1
    // poisoning class the hostile gate found on t09, pinned here for t10)
    val fps = SparkEntry.queries("t10_winnow_fingerprint")(spark, advDir)
      .select($"doc_id", $"n_fingerprints").as[(Long, Int)].collect().toMap
    (1000L to 1002L).foreach(id =>
      assert(fps(id) == 0, s"NULL-text doc $id: ${fps(id)} fingerprints"))
    assert(fps.values.forall(_ >= 0), "no negative fingerprint counts")
    val bpe = SparkEntry.queries("t25_bpe_tokens")(spark, advDir)
    assert(bpe.count() >= 1, "BPE training survives the hostile corpus")
  }

  test("streaming gates survive the full hostile corpus: dedup and " +
      "segment gates ingest it, replays are idempotent, contentless " +
      "docs neither crash nor poison") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_advstream_").toString
    val rows = Tables.documents(spark, advDir)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq // Option-free tuple: text may be null — keep as-is
    Seq("_bands", "_shingles").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS advstream_idx$t"))
    graft.operators.Dedup.writeDedupIndex(
      Seq((900000L, "seed document for the hostile stream gate test x " +
        (0 until 30).map(i => s"s$i").mkString(" "))).toDF("doc_id", "text"),
      "advstream_idx")
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.dedupStream(
      mem.toDF().toDF("doc_id", "text"), "advstream_idx", s"$dir/store",
      growEvery = 2)
    // the whole hostile corpus in two micro-batches (exact-mass family
    // split across the batch boundary so cross-batch gating runs too)
    val (h1, h2) = rows.partition(_._1 % 2 == 0)
    mem.addData(h1: _*); q.processAllAvailable()
    mem.addData(h2: _*); q.processAllAvailable()
    val stored = spark.read.parquet(s"$dir/store/*.parquet")
      .select("doc_id").as[Long].collect().toSet
    assert(stored.nonEmpty, "hostile stream must land survivors")
    // the 40x exact-mass family collapses: content-hash dedup keeps ONE
    // text regardless of which batch carried which copies
    assert((1400L to 1439L).count(stored.contains) == 1,
      s"exact mass must collapse to one stored copy, got " +
        s"${(1400L to 1439L).count(stored.contains)}")
    // replaying batch 2's content as a NEW batch is fully gated (every
    // doc matches the store/index built from itself)
    mem.addData(h2.map { case (id, t) => (id + 500000L, t) }: _*)
    q.processAllAvailable(); q.stop()
    val after = spark.read.parquet(s"$dir/store/*.parquet")
      .select("doc_id").as[Long].collect().toSet
    // non-null replayed texts are exact dups (content hash) — only the
    // contentless docs (null text has no hash identity) may re-land
    val relanded = (after -- stored).filter(_ >= 500000L)
      .map(_ - 500000L)
    val contentless = rows.filter(r => r._2 == null ||
      r._2.trim.isEmpty).map(_._1).toSet
    assert(relanded.subsetOf(contentless),
      s"replayed content must gate on the grown index, re-landed: " +
        s"${relanded -- contentless}")
    Seq("_bands", "_shingles").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS advstream_idx$t"))
    spark.catalog.clearCache()
  }

  test("segment gate end-to-end on the hostile corpus: CJK boilerplate " +
      "gated post-growth, contentless docs land ungated, replays gate " +
      "(VERDICT r17 #5)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_advseg_").toString
    val rows = Tables.documents(spark, advDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    Seq("_bands", "_shingles", "_segdigests").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS advseg_idx$t"))
    graft.operators.Dedup.writeSegmentIndex(
      Seq((900000L, (0 until 40).map(i => s"seedseg$i").mkString(" ")))
        .toDF("doc_id", "text"),
      "advseg_idx")
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.segmentDedupStream(
      mem.toDF().toDF("doc_id", "text"), "advseg_idx", s"$dir/store",
      growEvery = 2)
    // parity split puts the CJK boilerplate pair on opposite sides of
    // the batch boundary: 1600 (even) arrives first and grows the index;
    // 1601 — the SAME text ±1 char, invisible to word shingling, caught
    // only by the script-adaptive char segments — arrives second
    val (h1, h2) = rows.partition(_._1 % 2 == 0)
    mem.addData(h1: _*); q.processAllAvailable()
    mem.addData(h2: _*); q.processAllAvailable()
    val stored = spark.read.parquet(s"$dir/store/*.parquet")
      .select("doc_id").as[Long].collect().toSet
    assert(stored.contains(1600L), "the first CJK doc is novel → lands")
    assert(!stored.contains(1601L),
      "CJK boilerplate (±1 char of grown doc 1600) must be gated " +
        "post-growth by the adaptive char segments")
    // 40× exact mass: batch 1's copies content-hash-collapse in the
    // store; batch 2's copies gate on batch 1's grown segments
    assert((1400L to 1439L).count(stored.contains) == 1,
      s"exact mass must collapse to one stored copy, got " +
        s"${(1400L to 1439L).count(stored.contains)}")
    // contentless docs produce no segments → no kept_ratio verdict →
    // never GATED (store-level content-hash dedup may still collapse
    // byte-identical empties — that's the dedup store's policy, not the
    // segment gate's)
    val contentless = rows.filter(r => r._2 == null || r._2.trim.isEmpty)
      .map(_._1).toSet
    val emptyNonNull = rows.filter(r => r._2 != null && r._2.trim.isEmpty)
    assert(emptyNonNull.map(_._1).count(stored.contains) >= 1,
      "contentless docs must pass the segment gate (land, up to " +
        "content-hash collapse)")
    // replay of batch 2's content as new ids: every segmented doc now
    // matches its own grown keepers → gated; only contentless docs (no
    // segments, and null text no content hash) may re-land
    mem.addData(h2.map { case (id, t) => (id + 500000L, t) }: _*)
    q.processAllAvailable(); q.stop()
    val after = spark.read.parquet(s"$dir/store/*.parquet")
      .select("doc_id").as[Long].collect().toSet
    val relanded = (after -- stored).filter(_ >= 500000L).map(_ - 500000L)
    assert(relanded.subsetOf(contentless),
      s"replayed segmented docs must gate on their own keepers, " +
        s"re-landed: ${relanded -- contentless}")
    Seq("_bands", "_shingles", "_segdigests").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS advseg_idx$t"))
    spark.catalog.clearCache()
  }

  test("substring gate end-to-end on the hostile corpus: the 40× run " +
      "mass keeps ONE intact copy, nothing is dropped, replayed text is " +
      "stripped post-growth (VERDICT r17 #5)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_advsub_").toString
    val rows = Tables.documents(spark, advDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val exactText = rows.find(_._1 == 1400L).get._2
    assert(exactText.split(" ").length >= 20, "mass family must clear k")
    spark.sql("DROP TABLE IF EXISTS advsub_idx_grams")
    graft.operators.Dedup.writeSubstringIndex(
      Seq((900000L, (0 until 40).map(i => s"seedtok$i").mkString(" ")))
        .toDF("doc_id", "text"),
      "advsub_idx", k = 20)
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.substringDedupStream(
      mem.toDF().toDF("doc_id", "text"), "advsub_idx", s"$dir/store",
      k = 20)
    val (h1, h2) = rows.partition(_._1 % 2 == 0)
    mem.addData(h1: _*); q.processAllAvailable()
    mem.addData(h2: _*); q.processAllAvailable()
    val texts = spark.read.parquet(s"$dir/store/*.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // the rewrite gate never drops a doc — every hostile id lands
    // (gutted perhaps, but present)
    val missing = rows.map(_._1).toSet -- texts.keySet
    assert(missing.isEmpty, s"substring gate must land every doc: $missing")
    // 40× exact mass (a single ≥k-token run): exactly one keeper copy
    // retains the run; the other 39 — within-batch later occurrences and
    // the post-growth batch — are stripped
    val intact = (1400L to 1439L).count(id => texts(id) == exactText)
    assert(intact == 1,
      s"exact-mass family must keep exactly one intact copy, got $intact")
    assert((1400L to 1439L).forall(id => texts.contains(id)))
    // CJK / short docs are below k tokens — pass through byte-identical
    assert(texts(1600L) == rows.find(_._1 == 1600L).get._2,
      "sub-k CJK docs must pass unmodified")
    // replay of batch 2 under new ids: its novel runs are now owned by
    // the index → the replayed mass copies arrive stripped
    mem.addData(h2.map { case (id, t) => (id + 500000L, t) }: _*)
    q.processAllAvailable(); q.stop()
    val after = spark.read.parquet(s"$dir/store/*.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val replayIntact = (1400L to 1439L).filter(_ % 2 == 1)
      .count(id => after.get(id + 500000L).contains(exactText))
    assert(replayIntact == 0,
      s"replayed mass copies must be stripped post-growth: $replayIntact intact")
    spark.sql("DROP TABLE IF EXISTS advsub_idx_grams")
    spark.catalog.clearCache()
  }

  test("semantic gate end-to-end on hostile embeddings: degenerate " +
      "vectors dead-letter, the identical pair gates across the batch " +
      "boundary, negation lands, replays gate (VERDICT r17 #5)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.Relational.{AdmissionChecks, VectorCheck}
    val dir = java.nio.file.Files.createTempDirectory("graft_advsem_").toString
    val rows = Tables.embeddings(spark, advDir)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Option[Float]])].collect().toSeq
    Seq("_vecs", "_vecmeta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS advsem_idx$t"))
    graft.operators.Dedup.writeSemanticIndex(
      GenCorpus.generateEmbeddings(spark, 10)
        .withColumn("vec_id", $"vec_id" + 900000L), "advsem_idx")
    val mem = MemoryStream[(Long, Seq[Option[Float]])]
    val q = graft.streaming.StreamingOps.semanticDedupStream(
      mem.toDF().toDF("vec_id", "embedding"), "advsem_idx", s"$dir/store",
      audit = Some(AdmissionChecks(
        vectors = Seq(VectorCheck("embedding", dim = 64)))))
    // parity split puts the byte-identical pair (1001 odd, 1002 even) on
    // opposite sides of the boundary: 1002 lands + grows, 1001 must gate
    val (h1, h2) = rows.partition(_._1 % 2 == 0)
    mem.addData(h1: _*); q.processAllAvailable()
    mem.addData(h2: _*); q.processAllAvailable()
    val stored = spark.read.parquet(s"$dir/store/*.parquet")
      .select("vec_id").as[Long].collect().toSet
    assert(stored.contains(1002L), "first of the identical pair is novel")
    assert(!stored.contains(1001L),
      "identical vector must gate on the index grown by its twin")
    assert(stored.contains(1003L),
      "exact negation (cos −1) must land — similarity is signed")
    val dlq = spark.read.parquet(s"$dir/store_dlq/*.parquet")
      .select("vec_id").as[Long].collect().toSet
    assert(Set(1000L, 1008L).subsetOf(dlq),
      s"zero and NULL-component vectors must dead-letter, got $dlq")
    assert((dlq & stored).isEmpty, "dead-lettered vectors never store")
    // replay of batch 2's exact content (same ids, new micro-batch):
    // every admitted vector matches ITSELF in the grown index → the
    // stored set is unchanged; the degenerate rows dead-letter again
    mem.addData(h2: _*)
    q.processAllAvailable(); q.stop()
    val after = spark.read.parquet(s"$dir/store/*.parquet")
      .select("vec_id").as[Long].collect().toSet
    assert(after == stored,
      s"replayed vectors must all gate: ${(after -- stored).toSeq.sorted}")
    Seq("_vecs", "_vecmeta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS advsem_idx$t"))
    spark.catalog.clearCache()
  }

  test("p01/p07 curation over the hostile corpus: waterfall is " +
      "conserved (n_out = n_in - n_killed, stages chain) and total mass " +
      "is accounted") {
    val wf = SparkEntry.queries("p07_curation_dag")(spark, advDir)
      .select($"stage_ord", $"stage", $"n_in", $"n_out", $"n_killed")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(wf.nonEmpty)
    wf.foreach { case (_, st, nIn, nOut, nKill) =>
      assert(nKill >= 0 && nOut >= 0 && nIn >= 0, s"$st: negative count")
      if (st != "p02_sequence_pack" && st != "p06_epoch_shuffle")
        assert(nOut == nIn - nKill, s"$st: $nIn - $nKill != $nOut")
    }
    // doc-granularity stages chain: stage i's n_out is stage i+1's n_in
    val docStages = wf.takeWhile(_._2 != "p02_sequence_pack")
    docStages.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 == a._4, s"${b._2} n_in ${b._3} != ${a._2} n_out ${a._4}")
      case _ => ()
    }
    val raw = docStages.head._3
    // curationDag's convention: doc_id < 5 is the decontamination
    // benchmark, the rest is the corpus
    assert(raw == Tables.documents(spark, advDir)
      .filter($"doc_id" >= 5).count(),
      "p00_raw must count the whole hostile corpus minus the benchmark")
  }
}
