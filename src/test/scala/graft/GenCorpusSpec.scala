package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The generated probe corpus must be deterministic and its planted
  * near-dups must actually sit in the near-dup band the dedup family
  * targets (above dedupGroups' 0.8 verify threshold, below exact
  * equality) — otherwise the sf1 probe numbers in SURVEY §7.6 measure a
  * corpus, not the engine.
  */
class GenCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("generation is deterministic and shaped like the testdata") {
    val a = GenCorpus.generate(spark, 500, 5).orderBy("doc_id").collect()
    val b = GenCorpus.generate(spark, 500, 5).orderBy("doc_id").collect()
    assert(a.sameElements(b), "same args must generate identical rows")
    assert(a.length > 500 && a.length <= 527, s"~5% dups expected: ${a.length}")
    val toks = a.map(_.getAs[String]("text").split(" ").length)
    assert(toks.min >= 30 && toks.max <= 92, s"token range ${toks.min}..${toks.max}")
    assert(a.map(_.getAs[String]("lang")).distinct.length == 5)
  }

  test("planted near-dups are near (J >= 0.8) but not exact") {
    val docs = GenCorpus.generate(spark, 500, 5)
    // every planted doc (id >= nBase) must pair with its base in
    // dedupGroups' clusters; no base-only cluster may exist
    val groups = Dedup.dedupGroups(docs.select($"doc_id", $"text"))
    val clustered = groups.groupBy($"cluster_id")
      .agg(count(lit(1)).as("n"), max($"doc_id").as("max_id"))
      .filter($"n" > 1)
    val rows = clustered.collect()
    val nDup = docs.filter($"doc_id" >= 500).count()
    assert(rows.length == nDup,
      s"expected $nDup planted clusters, found ${rows.length}")
    assert(rows.forall(_.getAs[Long]("max_id") >= 500L),
      "every size>1 cluster must contain a planted doc (no false merges)")
    // not exact: the suffix makes text differ from the base
    val dupTexts = docs.filter($"doc_id" >= 500).select($"text").as[String]
    val baseTexts = docs.filter($"doc_id" < 500).select($"text").as[String]
    assert(dupTexts.intersect(baseTexts).isEmpty,
      "planted dups must not be byte-identical to their base")
  }

  test("dupPct outside [0, 50] is rejected, not silently wrong") {
    intercept[IllegalArgumentException](GenCorpus.generate(spark, 100, 100))
    intercept[IllegalArgumentException](GenCorpus.generate(spark, 100, 60))
    intercept[IllegalArgumentException](GenCorpus.generate(spark, 100, -1))
    intercept[IllegalArgumentException](GenCorpus.generateMedia(spark, 100, 100))
  }

  test("generated media: deterministic binary payloads, exact planted dup mass") {
    val m = GenCorpus.generateMedia(spark, 500, dupPct = 8).persist()
    val nDup = 500L * 8 / 92
    assert(m.count() == 500 + nDup)
    // payloads are real opaque blobs in the documented size band, and the
    // stored n_bytes/content_hash columns are faithful to the bytes
    val bad = m.filter(
      length($"payload") =!= $"n_bytes" ||
        $"n_bytes" < 128 || $"n_bytes" > 4095 ||
        sha2($"payload", 256) =!= $"content_hash").count()
    assert(bad == 0, "payload metadata must match the actual bytes")
    // planted duplicates are byte-identical to a base row (same hash,
    // same kind) and exactly account for m04's dup-asset mass
    val dups = multimodal.Multimodal.payloadDedupStatsOf(m)
      .agg(sum($"n_dup_assets")).as[Long].head()
    assert(dups == nDup, s"expected $nDup planted payload dups, m04 found $dups")
    val again = GenCorpus.generateMedia(spark, 500, dupPct = 8)
    assert(m.orderBy("doc_id").collect()
      .sameElements(again.orderBy("doc_id").collect()),
      "same args must generate identical media rows")
    m.unpersist()
    ()
  }
}
