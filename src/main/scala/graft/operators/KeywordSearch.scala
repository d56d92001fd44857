package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword prefix-search / autocomplete (reference: website/src/trie.js —
  * a browser-side trie over keyword text — and KeywordsPage.jsx:51-72,
  * which feeds it keyword counts; AutocompleteInput.jsx queries it with a
  * prefix and shows the top matches by count).
  *
  * The engine-side re-expression: a trie descent over sorted keys IS a
  * range scan. The keyword document-frequency table (q11) is stored
  * partitioned by the keyword's first character — the trie's first level
  * as hive partition directories — and sorted by keyword within each
  * partition, so a prefix query prunes to one directory (PartitionFilters,
  * zero I/O outside it) and the `startswith` predicate pushes into the
  * parquet scan (PushedFilters + row-group min/max skipping over the
  * sorted key). Top-k by count is a `TakeOrderedAndProject` — per-partition
  * k, no global sort.
  */
object KeywordSearch {

  /** q34 end-to-end form (oracle-checkable): docfreq over lowercased
    * distinct-per-doc tokens, prefix-filtered BEFORE the aggregation (the
    * filter is on the group key, so pre-agg placement is equivalent and
    * only prefix-matching words ever enter the shuffle), then top-k by
    * document count with a deterministic keyword tie-break — the trie's
    * `search(prefix)` ordering.
    */
  def keywordPrefixSearch(s: SparkSession, dir: String,
      prefix: String = "s", k: Int = 5): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(explode(array_distinct(split(lower($"text"), " "))).as("keyword"))
      .filter($"keyword".startsWith(prefix) && length($"keyword") >= 3)
      .groupBy($"keyword")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"n_docs".desc, $"keyword")
      .limit(k)
  }

  val keywordPrefixSearchSql: String =
    """SELECT keyword, count(*) AS n_docs
      |FROM (
      |  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS keyword
      |  FROM documents)
      |WHERE keyword LIKE 's%' AND len(keyword) >= 3
      |GROUP BY keyword
      |ORDER BY n_docs DESC, keyword
      |LIMIT 5""".stripMargin

  /** Materialize a keyword-stats frame (`keyword`, counts…) as the
    * prefix-searchable store: hive-partitioned on the first character,
    * sorted by keyword inside each partition. At 100 TB the stats table is
    * keyword-cardinality-sized (≪ corpus) and this layout makes every
    * autocomplete query a one-directory range scan.
    */
  def writeKeywordStore(stats: DataFrame, path: String): Unit =
    stats
      // an empty keyword would land in Hive's default-partition dir and
      // never be reachable by a prefix query — drop it at write time
      .filter(length(col("keyword")) > 0)
      .withColumn("k1", substring(col("keyword"), 1, 1))
      .repartition(col("k1"))
      .sortWithinPartitions("keyword")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("k1")
      .parquet(path)

  /** Prefix top-k against a stored keyword store: the first-character
    * equality prunes partitions before any I/O; `startswith` pushes into
    * the scan.
    */
  def prefixTopK(s: SparkSession, path: String, prefix: String,
      k: Int = 10): DataFrame = {
    require(prefix.nonEmpty, "prefix must be non-empty")
    s.read.parquet(path)
      .filter(col("k1") === prefix.substring(0, 1) &&
        col("keyword").startsWith(prefix))
      .drop("k1")
      .orderBy(col("n_docs").desc, col("keyword"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_keyword_prefix" -> ((s: SparkSession, d: String) =>
      keywordPrefixSearch(s, d)))

  val oracles: Map[String, String] = Map(
    "q34_keyword_prefix" -> keywordPrefixSearchSql)
}
