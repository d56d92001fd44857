package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mapping-table-driven prioritized classification (the reference walks a
  * ~20-entry ordered pattern list, first match wins —
  * extract_document_info.py:68-148). The pattern list is DATA (a table a
  * user edits), not code: `classify` takes an ordered (priority, regex,
  * label) table and compiles it into a single first-match-wins CASE chain.
  *
  * Why compile instead of joining docs × patterns on rlike: a join keeps
  * the regex on the stream side as a non-foldable expression, so Spark
  * recompiles every pattern for every row — and it multiplies the corpus
  * by the pattern count before the min(priority) collapse. Folding the
  * (bounded, config-sized — the reference's is 20 entries) table into a
  * when-chain keeps each regex compiled once inside whole-stage codegen
  * and the scan map-only; collecting ≤ some hundreds of config rows to the
  * driver is the same bounded-state trade IvfIndex.train makes.
  */
object PatternClassifier {

  /** One classifier rule: lower priority wins when several match. */
  final case class Rule(priority: Int, pattern: String, label: String)

  /** Compile an ordered rule list into a first-match-wins column. */
  def firstMatch(text: Column, rules: Seq[Rule], default: String): Column = {
    // Secondary (pattern, label) key: equal-priority rules arrive in
    // arbitrary collect() order, and the when-chain order decides ties.
    val ordered = rules.sortBy(r => (r.priority, r.pattern, r.label))
    ordered.foldLeft(Option.empty[Column]) { (acc, r) =>
      val c = text.rlike(r.pattern)
      Some(acc.fold(when(c, r.label))(_.when(c, r.label)))
    }.fold(lit(default))(_.otherwise(default))
  }

  /** Table-driven entry point: the rule table is a DataFrame with columns
    * (priority, pattern, label) — e.g. read from parquet/CSV config. It is
    * config-sized by contract; collect it and compile.
    */
  def classify(df: DataFrame, textCol: String, rulesDf: DataFrame,
      default: String = "other", outCol: String = "doc_type"): DataFrame = {
    // Explicit casts: a rules table written by another tool often carries
    // BIGINT priority (JSON/parquet default) — getInt on it would throw.
    val rules = rulesDf.select(
        col("priority").cast("int"), col("pattern").cast("string"),
        col("label").cast("string"))
      .collect()
      .map(r => Rule(r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq
    df.withColumn(outCol, firstMatch(col(textCol), rules, default))
  }
}
