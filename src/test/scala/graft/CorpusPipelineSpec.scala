package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPipeline

/** The composed curation pipeline: gates, dedups, annotates. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  val long1 = ("the quick brown fox jumps over the lazy dog and keeps " +
    "running through the green field all day long without any rest at all")
  val long1Dup = long1
  val long1Near = long1.replace("green", "wide")
  val shortDoc = "too short"

  test("curation drops short docs, exact dups, and near dups; keeps first ids") {
    val docs = Seq(
      1L -> long1, 2L -> long1Dup, 3L -> long1Near,
      4L -> shortDoc,
      5L -> ("a completely different story about distributed systems and " +
        "the catalyst optimizer that survives the curation pipeline easily today"))
      .toDF("doc_id", "text")
    // one word changed in a 22-word doc → 3-gram jaccard ≈ 0.74: use a
    // threshold below that so doc 3 counts as a near dup of doc 1.
    val curated = CorpusPipeline.curate(docs,
      CorpusPipeline.Config(nearDupJaccard = 0.6))
    val kept = curated.select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L),
      s"expected {1,5} (2=exact dup, 3=near dup, 4=short), got $kept")
    val langs = curated.select($"predicted_lang").as[String].collect().toSet
    assert(langs == Set("en"))
  }

  test("report summarizes kept ratio and token volume") {
    val docs = Tables.documents(spark, sf)
    val curated = CorpusPipeline.curate(docs)
    val r = CorpusPipeline.report(docs, curated).collect()(0)
    assert(r.getAs[Long]("n_raw") == 500)
    assert(r.getAs[Long]("n_curated") > 0)
    assert(r.getAs[Double]("kept_ratio") <= 1.0)
  }

  test("curated corpus on test data removes the planted near-duplicates") {
    val docs = Tables.documents(spark, sf)
    val curated = CorpusPipeline.curate(docs)
    val ids = curated.select($"doc_id").as[Long].collect().toSet
    // ground truth: every ≥0.8-jaccard pair in the raw corpus must have
    // lost at least one member to curation (quality gate or dedup)
    val pairs = operators.Dedup
      .minhashPairs(docs.select($"doc_id", $"text"), minJaccard = 0.8)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "test data should contain planted near-dups")
    val survivors = pairs.filter(p => ids.contains(p._1) && ids.contains(p._2))
    assert(survivors.isEmpty, s"near-dup pairs fully survived: ${survivors.take(5).toSeq}")
  }
}
