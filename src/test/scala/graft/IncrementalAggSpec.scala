package graft

import org.apache.spark.sql.functions._
import graft.pipeline.IncrementalAgg

/** Incremental rollup merge must equal the full recompute. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("merged delta rollup equals full recompute") {
    val docs = Tables.documents(spark, sf)
    val old = docs.filter($"doc_id" < 400)
    val delta = docs.filter($"doc_id" >= 400)
    val merged = IncrementalAgg.merge(IncrementalAgg.sourceAgg(old), delta)
    val full = IncrementalAgg.sourceAgg(docs)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("merging an empty delta is a no-op") {
    val docs = Tables.documents(spark, sf)
    val agg = IncrementalAgg.sourceAgg(docs)
    val merged = IncrementalAgg.merge(agg, docs.filter($"doc_id" < 0))
    assert(merged.exceptAll(agg).isEmpty && agg.exceptAll(merged).isEmpty)
  }
}
