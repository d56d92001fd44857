package graft

import org.apache.spark.sql.functions._

/** Incremental-path benchmark (VERDICT r12 #6): probe a FIXED delta batch
  * against stored dedup state at 1× and 10× corpus size — the measured
  * form of the O(delta) claim behind the d14-family contract (the daily
  * batch of a 100 TB pipeline pays for the batch, never the corpus). The
  * specs assert the PLANS (no exchange on the stored side); this measures
  * the wall-clock consequence: probe time flat as the stored corpus grows
  * 10×, for every stored index family (doc band, segment keeper,
  * substring gram, semantic vector) and for the composed curateDelta DAG.
  *
  * The delta is half exact replicas of stored docs (every probe must
  * surface its stored partner) and half novel synthesized docs, so both
  * the hit and miss paths are exercised.
  *
  * Usage: runMain graft.DeltaProbe [baseDir] [bigDir] [deltaN]
  * Output: one JSON line per (family, scale) with build + probe seconds;
  * the driver artifact is DELTA_BENCH_r{N}.json.
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(1).getOrElse("/tmp/graftdata/sf1")
    val deltaN = args.lift(2).map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // DROP TABLE alone is not enough: a crashed prior JVM leaves the
    // warehouse DIRECTORY behind with no entry in this run's fresh
    // metastore, and the next CTAS dies with LOCATION_ALREADY_EXISTS —
    // so always clear the location too.
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    def drop(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(warehouse, t.toLowerCase)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    def dropFamily(prefix: String): Unit =
      Seq("_bands", "_shingles", "_segdigests", "_grams", "_vecs",
        "_docdigests", "_sub_grams", "_seg_segdigests", "_seg_bands",
        "_seg_shingles", "_doc_bands", "_doc_shingles", "_sem_vecs")
        .foreach(sfx => drop(prefix + sfx))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // Fixed-SIZE delta, built PER SCALE: deltaN/2 exact replicas of the
    // scale-under-test's own docs (ids shifted far above any corpus id
    // so they are the "later" element everywhere) + deltaN/2 novel docs.
    // Both halves follow the r13-ADVICE contract the semantic leg
    // already honors — every replica must surface its STORED partner at
    // each scale, and every novel doc must miss:
    //  - replicas from baseDir against the x10 store measured a
    //    miss-only workload (the x10 GenScale corpus shares no text
    //    with testdata), so hits==0 and the x1-vs-x10 flatness
    //    comparison mixed hit-heavy against miss-only;
    //  - the novel half generates at an id OFFSET disjoint from any
    //    GenScale store's id range: generate() derives TEXT from
    //    doc_id, so novel docs at ids 0..249 would be byte-identical
    //    to the x10 store's first 250 docs and "novel" would silently
    //    mean "exact dup" there.
    println(s"""{"probe":"delta_batch","n_delta":$deltaN}""")

    Seq("x1" -> baseDir, "x10" -> bigDir).foreach { case (tag, dir) =>
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      val nStored = docs.count()
      val replicas = Tables.documents(spark, dir)
        .orderBy($"doc_id").limit(deltaN / 2)
        .select(($"doc_id" + 900000000L).as("doc_id"), $"source", $"text")
      val novel = GenCorpus
        .generate(spark, (deltaN - deltaN / 2).toLong, 0,
          idOffset = 950000000L)
        .select($"doc_id", $"source", $"text")
      val delta = replicas.unionByName(novel).localCheckpoint()
      require(delta.count() == deltaN, s"delta size drifted at $tag")
      val dtext = delta.select($"doc_id", $"text")

      // doc-granularity minhash band index (d14's store)
      locally {
        dropFamily(s"dprobe_doc_$tag")
        val b = time(operators.Dedup.writeDedupIndex(docs, s"dprobe_doc_$tag"))
        var hits = 0L
        val p = time { hits = operators.Dedup
          .dedupDelta(spark, s"dprobe_doc_$tag", dtext).count() }
        // every replica is an exact dup of a stored doc (identical bands,
        // jaccard 1.0) — same loud-failure contract as the semantic leg,
        // with the same oversized-bucket-drop slack.
        require(hits >= deltaN / 2 * 9 / 10,
          s"dedup $tag: only $hits of ${deltaN / 2} replica probes hit — miss-only run")
        println(f"""{"probe":"delta_dedup_$tag","stored":$nStored,"build_sec":$b%.2f,"probe_sec":$p%.2f,"hits":$hits}""")
        dropFamily(s"dprobe_doc_$tag"); spark.catalog.clearCache()
      }

      // segment-keeper index (d18b's store)
      locally {
        dropFamily(s"dprobe_seg_$tag")
        val b = time(operators.Dedup.writeSegmentIndex(docs, s"dprobe_seg_$tag"))
        var gated = 0L
        val p = time { gated = operators.Dedup
          .segmentDeltaFull(spark, s"dprobe_seg_$tag", dtext)
          .filter($"kept_ratio" < 0.5).count() }
        // every replica's segments are ALL stored verbatim → kept_ratio 0
        require(gated >= deltaN / 2 * 9 / 10,
          s"segment $tag: only $gated of ${deltaN / 2} replicas gated — miss-only run")
        println(f"""{"probe":"delta_segment_$tag","stored":$nStored,"build_sec":$b%.2f,"probe_sec":$p%.2f,"gated":$gated}""")
        dropFamily(s"dprobe_seg_$tag"); spark.catalog.clearCache()
      }

      // substring gram index (d19's store)
      locally {
        dropFamily(s"dprobe_sub_$tag")
        val b = time(operators.Dedup.writeSubstringIndex(docs, s"dprobe_sub_$tag"))
        var rewritten = 0L
        val p = time { rewritten = operators.Dedup
          .substringRewriteDelta(spark, s"dprobe_sub_$tag", dtext).count() }
        println(f"""{"probe":"delta_substring_$tag","stored":$nStored,"build_sec":$b%.2f,"probe_sec":$p%.2f,"rewritten":$rewritten}""")
        dropFamily(s"dprobe_sub_$tag"); spark.catalog.clearCache()
      }

      // semantic vector index (d11's store) over the dir's embeddings;
      // the delta probes replica vectors (must hit) + noise vectors.
      // The replicas come from THE SCALE UNDER TEST (ADVICE r13: the
      // former baseDir-replica delta had no stored partner at x10 —
      // bigDir's vectors are unrelated — so the x10 leg silently
      // measured a miss-only workload against x1's hit-heavy one), and
      // the hit count is asserted so a miss-only run fails loudly.
      locally {
        dropFamily(s"dprobe_sem_$tag")
        val vecs = Tables.embeddings(spark, dir)
          .select($"vec_id", $"embedding")
        val vDelta = vecs
          .orderBy($"vec_id").limit(deltaN / 2)
          .select(($"vec_id" + 900000000L).as("vec_id"), $"embedding")
          .localCheckpoint()
        val b = time(operators.Dedup.writeSemanticIndex(vecs, s"dprobe_sem_$tag"))
        var hits = 0L
        val p = time { hits = operators.Dedup
          .semanticDelta(spark, s"dprobe_sem_$tag", vDelta)
          .select($"new_id").distinct().count() }
        // every replica's stored twin is cos=1.0 ≥ minCos and lives in the
        // replica's own home bucket (identical vector → identical home
        // signature), so unless the write-time oversized-bucket drop
        // excluded it the probe MUST surface it; allow that slack only.
        require(hits >= deltaN / 2 * 9 / 10,
          s"semantic $tag: only $hits of ${deltaN / 2} replica probes hit — miss-only run")
        println(f"""{"probe":"delta_semantic_$tag","stored":${vecs.count()},"build_sec":$b%.2f,"probe_sec":$p%.2f,"hits":$hits}""")
        dropFamily(s"dprobe_sem_$tag"); spark.catalog.clearCache()
      }

      // the composed incremental DAG: full-state write once, then
      // curateDelta of the same fixed batch — the end-to-end O(delta)
      // number (p07's incremental form).
      locally {
        dropFamily(s"dprobe_dag_$tag")
        val bench = Tables.documents(spark, baseDir)
          .orderBy($"doc_id").limit(50).select($"text")
        val b = time {
          val r = pipeline.CorpusPipeline.curateFull(
            Tables.documents(spark, dir).select($"doc_id", $"source", $"text"),
            bench, stateTable = Some(s"dprobe_dag_$tag"))
          r.waterfall.count()
          ()
        }
        spark.catalog.clearCache()
        var kept = 0L
        val p = time { kept = pipeline.CorpusPipeline
          .curateDelta(delta, bench, s"dprobe_dag_$tag").docs.count() }
        println(f"""{"probe":"delta_curate_$tag","stored":$nStored,"full_dag_sec":$b%.2f,"delta_dag_sec":$p%.2f,"kept":$kept}""")
        dropFamily(s"dprobe_dag_$tag"); spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
