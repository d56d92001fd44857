package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance: merge a delta batch into an existing
  * aggregate without rescanning the corpus. The reference regenerates its
  * website aggregates from the full document set every run
  * (generate_website_data.py); at 100 TB the recompute is the bottleneck,
  * while the merge below touches only |existing agg| + |delta|.
  *
  * Works for any decomposable aggregate kept in sum/count form (avg is
  * derived at read time). Shape: union(existing, delta-agg) → re-agg on
  * the key — one shuffle over agg-sized (not corpus-sized) data.
  */
object IncrementalAgg {

  /** Per-source rollup in mergeable form. */
  def sourceAgg(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
  }

  /** Merge an existing rollup with a new batch's rollup. */
  def merge(existing: DataFrame, deltaDocs: DataFrame): DataFrame = {
    import existing.sparkSession.implicits._
    existing.unionByName(sourceAgg(deltaDocs))
      .groupBy($"source")
      .agg(sum($"n_docs").as("n_docs"), sum($"total_chars").as("total_chars"))
  }
}
