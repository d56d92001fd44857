package graft

import org.apache.spark.sql.functions._
import graft.pipeline.DocumentPipeline
import graft.operators.Dedup

/** Cross-parameter invariants of the round-4 operators — properties that
  * must hold for ANY shard count / corpus, beyond the fixed-parameter
  * oracle check.
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("p02: token totals are conserved for any shard count") {
    val docs = Tables.documents(spark, sf)
    val totalTokens = docs
      .select(sum(size(split($"text", " ")).cast("long"))).as[Long].collect()(0)
    for (shards <- Seq(1, 4, 8)) {
      val packed = DocumentPipeline.sequencePackOf(docs, shards = shards)
      val (seqTokens, nDocs) = packed
        .agg(sum($"seq_tokens"), sum($"n_docs")).as[(Long, Long)].collect()(0)
      assert(seqTokens == totalTokens,
        s"shards=$shards lost tokens: $seqTokens != $totalTokens")
      assert(nDocs == docs.count(), s"shards=$shards lost docs")
    }
  }

  test("p02: seq ids start at 0 and never exceed the token-span boundary") {
    // A doc's first token lands in seq floor(cum_before/budget). The first
    // doc of each source has cum_before 0 → seq 0; no doc can start past
    // the last token of its source's concatenation → seq_id ≤
    // floor((total-1)/budget). (Equality is NOT guaranteed: a long doc
    // can span the final sequences with no doc starting inside them.)
    val docs = Tables.documents(spark, sf)
    val packed = DocumentPipeline.sequencePackOf(docs, budget = 512, shards = 8)
    val bySource = packed.groupBy($"source")
      .agg(min($"seq_id").as("min_seq"), max($"seq_id").as("max_seq"),
        sum($"seq_tokens").as("tok"))
      .as[(String, Long, Long, Long)].collect()
    bySource.foreach { case (src, minSeq, maxSeq, tok) =>
      assert(minSeq == 0L, s"$src: first sequence must be 0")
      assert(maxSeq <= (tok - 1) / 512,
        s"$src: max seq_id $maxSeq past the boundary of $tok tokens")
    }
  }

  test("t17: conditional probabilities sum to ~1 per context") {
    val lm = DocumentPipeline.bigramLm(spark, sf)
    val sums = lm.groupBy($"w1").agg(sum($"n_bigram" / $"n_context").as("s"))
      .as[(String, Double)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (w1, s) =>
      assert(math.abs(s - 1.0) < 1e-9, s"p(.|$w1) sums to $s")
    }
  }

  test("d10: masked positions are bounded by token count and monotone in minDf") {
    // deterministic subset (an unordered limit can pick different rows
    // across the two independent jobs below)
    val docs = Tables.documents(spark, sf).filter($"doc_id" < 200)
    val loose = Dedup.hotNgramMaskOf(docs, n = 8, minDf = 2)
      .select($"doc_id", $"n_tokens", $"n_masked")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val strict = Dedup.hotNgramMaskOf(docs, n = 8, minDf = 3)
      .select($"doc_id", $"n_masked").as[(Long, Long)].collect().toMap
    loose.values.foreach { case (id, nt, nm) =>
      assert(nm <= nt, s"doc $id: masked $nm > tokens $nt")
      assert(strict(id) <= nm,
        s"doc $id: stricter df threshold must mask no more ($nm -> ${strict(id)})")
    }
  }

  test("p08: curriculum bands are quality-monotone, cover every doc, and " +
      "the within-band order is a pure function of (epoch, corpus)") {
    val docs = Tables.documents(spark, sf)
    def sched(epoch: Int) = DocumentPipeline
      .curriculumSchedule(spark, sf, bands = 4, epoch = epoch)
      .select($"doc_id", $"score", $"band", $"shard", $"pos")
      .as[(Long, Double, Int, Int, Long)].collect().toSeq
    val s1 = sched(1)
    assert(s1.map(_._1).distinct.size == docs.count(),
      "every doc scheduled exactly once")
    assert(sched(1) == s1, "schedule must be a pure function")
    // banding is by score thresholds: band i's max score can never
    // exceed band i+1's min score
    val byBand = s1.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBand.keySet == Set(1, 2, 3, 4), s"bands: ${byBand.keySet}")
    for (b <- 1 to 3)
      assert(byBand(b).max <= byBand(b + 1).min,
        s"band $b max ${byBand(b).max} > band ${b + 1} min ${byBand(b + 1).min}")
    // epoch changes the within-band order but never the banding
    val s2 = sched(2)
    assert(s1.map(t => t._1 -> t._3).toMap == s2.map(t => t._1 -> t._3).toMap,
      "bands are epoch-independent")
    val moved = s1.map(t => (t._1, t._4, t._5)).toSet
      .diff(s2.map(t => (t._1, t._4, t._5)).toSet).size
    assert(moved > s1.size / 2,
      s"epochs must reshuffle within bands: only $moved moved")
    // positions dense 1..n within every (band, shard)
    s1.groupBy(t => (t._3, t._4)).foreach { case (g, rows) =>
      assert(rows.map(_._5).sorted == (1L to rows.size).toSeq,
        s"positions not dense in $g")
    }
  }

  test("p06: epoch order is a pure function — rerun identical, epochs " +
      "independent, every doc ordered exactly once") {
    val docs = Tables.documents(spark, sf)
    def order(epoch: Int) = DocumentPipeline.epochShuffle(spark, sf, epoch)
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Long)]
      .collect().toSeq
    val e1 = order(1)
    assert(order(1) == e1, "same epoch must reproduce the identical order")
    val e2 = order(2)
    assert(e1.map(_._1).toSet == e2.map(_._1).toSet &&
      e1.map(_._1).size == docs.count(),
      "every doc appears exactly once in every epoch")
    val moved = e1.toSet.diff(e2.toSet).size
    assert(moved > e1.size / 2,
      s"epochs must be (near-)independent permutations: only $moved moved")
    // positions are dense 1..n within every shard
    val byShard = e1.groupBy(_._2)
    assert(byShard.values.forall(g =>
      g.map(_._3).sorted == (1L to g.size.toLong)), "dense per-shard positions")
  }

  test("p06: written epoch shards are shard-pruned and ord-sorted") {
    val dir = java.nio.file.Files.createTempDirectory("epoch_").toString + "/e1"
    val docs = Tables.documents(spark, sf)
    DocumentPipeline.writeEpochShards(docs, dir, epoch = 1, shards = 8)
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("shard="))
    assert(files == 8, s"expected 8 shard dirs, got $files")
    val rd = spark.read.parquet(dir)
    assert(rd.count() == docs.count())
    // within a shard file, rows come back in written (ord_key) order
    val keys = rd.filter($"shard" === 3).select($"ord_key")
      .as[Long].collect().toSeq
    assert(keys == keys.sorted, "shard file must be ord-sorted on disk")
  }
}
