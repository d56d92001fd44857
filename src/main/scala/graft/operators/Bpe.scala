package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Trained-merge-table BPE tokenization as an engine operator (VERDICT
  * r14 #5): token budgets in packing/counting were whitespace/regex
  * approximations — a real byte-pair-encoding count makes them
  * production-true. The tokenizer TRAINS offline on a bounded,
  * deterministic corpus sample (lowest doc_ids — exactly how production
  * tokenizers are built: train once on a sample, apply everywhere),
  * then the merge table rides the plan as a literal into the codegen'd
  * [[org.apache.spark.sql.graft.BpeTokenCount]] expression, so corpus
  * encoding is one map-side pass: no shuffle, no token explode, no UDF.
  *
  * Driver-side state is the sample's word-count table (bounded by the
  * sample size — the IvfIndex/PqIndex training-collect exception) and
  * the merge table (≤ `nMerges` rows).
  */
object Bpe {

  /** Train a merge table from a deterministic corpus sample: the
    * `sampleDocs` lowest doc_ids' word counts feed the classic greedy
    * loop ([[org.apache.spark.sql.graft.bpe.train]]). The word-count
    * aggregation is distributed (partial-agg'd groupBy); only the
    * sample's vocabulary lands on the driver.
    */
  def trainMerges(documents: DataFrame, nMerges: Int = 200,
      sampleDocs: Int = 400): Seq[(String, String)] = {
    val s = documents.sparkSession
    import s.implicits._
    val wordCounts = documents
      .orderBy($"doc_id").limit(sampleDocs)
      .select(explode(split(coalesce($"text", lit("")), " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    org.apache.spark.sql.graft.bpe.train(wordCounts, nMerges)
  }

  /** t25: per-document BPE token accounting against the corpus-trained
    * merge table — the whitespace count next to the real tokenizer
    * count, plus the fertility ratio (BPE tokens per whitespace word,
    * the standard tokenizer-health metric: rare/OOV-heavy documents
    * fragment into more tokens per word). Map-side encode; one
    * presentation sort.
    */
  def bpeTokenStats(s: SparkSession, dir: String, nMerges: Int = 200,
      sampleDocs: Int = 400): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val merges = trainMerges(docs, nMerges, sampleDocs)
    docs.select($"doc_id",
        org.apache.spark.sql.graft.GraftFunctions
          .space_token_count(coalesce($"text", lit(""))).cast("long")
          .as("n_ws_tokens"),
        org.apache.spark.sql.graft.GraftFunctions
          .bpe_token_count(coalesce($"text", lit("")), merges)
          .cast("long").as("n_bpe_tokens"))
      .withColumn("fertility",
        when($"n_ws_tokens" > 0,
          round($"n_bpe_tokens" / $"n_ws_tokens" + lit(1e-9), 4))
          .otherwise(lit(0.0)))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t25_bpe_tokens" -> ((s: SparkSession, d: String) => bpeTokenStats(s, d)))

  // BPE is merge-table-dependent (trained on the corpus sample) — not
  // SQL-portable; verified in BpeSpec against hand-computed merge
  // sequences, roundtrip reconstruction, and packing parity.
  val oracles: Map[String, String] = Map.empty
}
