package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** End-to-end corpus curation: the composed pipeline a training-data user
  * actually runs — quality gate → exact dedup → near-dup removal → language
  * annotation. Each stage is one of the §2 operators; this wires them.
  *
  * Scale shape: the quality gate and annotations are map-only; exact dedup
  * is one shuffle on the content hash; near-dup removal reuses the
  * MinHash-LSH candidate machinery and drops the higher doc_id of each
  * confirmed pair (greedy keep-first, the standard corpus policy).
  */
object CorpusPipeline {

  case class Config(
      minTokens: Int = 10,
      minStopwordRatio: Double = 0.0,
      nearDupJaccard: Double = 0.8)

  /** Returns the curated corpus with per-doc annotations. */
  def curate(documents: DataFrame, cfg: Config = Config()): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._

    // 1. map-only quality gate + annotations
    val scored = documents
      .withColumn("n_tokens", wsTokenCount($"text"))
      .withColumn("stopword_ratio", stopwordRatio($"text"))
      .withColumn("predicted_lang", predictLang(langScores($"text")))
      .withColumn("fingerprint", fingerprint($"text"))
      .filter($"n_tokens" >= cfg.minTokens &&
        $"stopword_ratio" >= cfg.minStopwordRatio)

    // 2. exact dedup: keep min doc_id per content hash. Persisted: the
    // deduped frame feeds the near-dup pair generation AND the final
    // anti-join — without it the regex-heavy scoring scan reruns per use.
    val keeper = scored
      .groupBy(sha2($"text", 256).as("_h"))
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val exactDeduped = scored.join(keeper, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. near-dup removal: drop the larger id of each confirmed pair
    val nearDupLosers = Dedup
      .minhashPairs(exactDeduped.select($"doc_id", $"text"),
        minJaccard = cfg.nearDupJaccard)
      .select($"doc_b".as("doc_id")).distinct()
    exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti")
  }

  /** Corpus-level curation report. */
  def report(raw: DataFrame, curated: DataFrame): DataFrame = {
    val s = raw.sparkSession
    import s.implicits._
    val nRaw = raw.count()
    val agg = curated.agg(
      count(lit(1)).as("n_curated"),
      sum($"n_tokens").as("total_tokens"),
      countDistinct($"predicted_lang").as("n_langs"))
    agg.withColumn("n_raw", lit(nRaw))
      .withColumn("kept_ratio",
        round($"n_curated".cast("double") / $"n_raw", 4))
  }

  def run(s: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(s, dir))
}
