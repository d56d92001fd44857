package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each `queries` entry is one operator from the inventory; `oracleSql`
  * carries the DuckDB-equivalent SQL for the driver's correctness gate.
  * Non-SQL-expressible operators (MinHash/SimHash/LSH/multimodal) are
  * rows-only here and verified in ScalaTest instead.
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the full corpus-curation pipeline — quality gate, exact + MinHash
    * dedup, language annotation — i.e. the engine's reason to exist.
    */
  def entry(spark: SparkSession): DataFrame =
    pipeline.CorpusPipeline.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    pipeline.Relational.queries ++ pipeline.DocumentPipeline.queries ++
      pipeline.Events.queries ++ pipeline.Analytics.queries ++
      operators.Dedup.queries ++ operators.KeywordSearch.queries ++
      operators.InvertedIndex.queries ++ operators.Redact.queries ++
      operators.Apss.queries ++ operators.Bpe.queries ++
      operators.Similarity.queries ++ operators.Graph.queries ++
      multimodal.Multimodal.queries ++
      Map(
        "p01_corpus_curate" -> ((s: SparkSession, d: String) =>
          pipeline.CorpusPipeline.curate(graft.Tables.documents(s, d))
            .select("doc_id", "predicted_lang", "n_tokens", "fingerprint")
            .orderBy("doc_id")),
        "p07_curation_dag" -> ((s: SparkSession, d: String) =>
          pipeline.CorpusPipeline.curationDag(s, d)),
        // p07 with the d19 substring-span stage ON (verdict r16 #4): the
        // FineWeb-shape DAG a production run actually pays for — benched
        // so the flagship number attributes d19's cost explicitly
        "p07b_curation_substring" -> ((s: SparkSession, d: String) =>
          pipeline.CorpusPipeline.curationDag(s, d,
            pipeline.CorpusPipeline.FullConfig(substringK = Some(20)))))

  /** DuckDB-runnable oracle SQL per query key (same column names/aliases). */
  def oracleSql: Map[String, String] =
    pipeline.Relational.oracles ++ pipeline.DocumentPipeline.oracles ++
      pipeline.Events.oracles ++ pipeline.Analytics.oracles ++
      operators.Dedup.oracles ++ operators.KeywordSearch.oracles ++
      operators.InvertedIndex.oracles ++ operators.Redact.oracles ++
      operators.Apss.oracles ++ operators.Bpe.oracles ++
      operators.Similarity.oracles ++ operators.Graph.oracles ++
      multimodal.Multimodal.oracles
}
