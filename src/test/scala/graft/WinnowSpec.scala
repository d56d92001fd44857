package graft

import org.apache.spark.sql.functions._
import graft.pipeline.DocumentPipeline

/** Winnowing fingerprint properties: determinism, containment under
  * shared passages, divergence for unrelated text.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def prints(rows: Seq[(Long, String)]): Map[Long, Seq[Long]] = {
    val df = rows.toDF("doc_id", "text")
    val hashes = transform(operators.Dedup.shingles($"text", 3), sh => xxhash64(sh))
    val p = array_distinct(transform(
      sequence(lit(0), greatest(size(hashes) - 4, lit(0))),
      i => array_min(slice(hashes, i + 1, lit(4)))))
    df.select($"doc_id", p.as("p")).as[(Long, Seq[Long])].collect().toMap
  }

  val passage = "the quick brown fox jumps over the lazy dog near the riverbank today"
  val docA = s"intro words here $passage closing remarks follow now"
  val docB = s"different opening text $passage and another ending entirely here"
  val docC = "nothing in common with those other documents at all whatsoever friends"

  test("shared passages share fingerprints; unrelated docs share none") {
    val p = prints(Seq(1L -> docA, 2L -> docB, 3L -> docC))
    val sharedAB = p(1L).toSet.intersect(p(2L).toSet)
    val sharedAC = p(1L).toSet.intersect(p(3L).toSet)
    assert(sharedAB.nonEmpty, "common passage must yield common fingerprints")
    assert(sharedAC.isEmpty)
  }

  test("query runs and digests are deterministic") {
    val a = DocumentPipeline.winnowFingerprint(spark, sf).collect()
    val b = DocumentPipeline.winnowFingerprint(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.length == 500)
  }
}
