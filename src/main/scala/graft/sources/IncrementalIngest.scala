package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Incremental batch-append parquet store keyed by content hash — the
  * reference's core ingest contract (extract_pdf_text.py:120-241):
  * each batch lands as its own timestamped zstd parquet file; records whose
  * content hash already exists in ANY prior batch are skipped; an audit
  * verifies global hash uniqueness.
  *
  * Spark-first shape: "already processed" is an anti-join against the
  * store's hash projection (a column-pruned scan of all batch files — at
  * 100 TB the store would be a partitioned table and this scan reads only
  * the hash column's pages); the reference's Python set-in-memory loop
  * (load_processed_ids) does not scale past one node.
  */
object IncrementalIngest {

  val hashCol = "content_hash"

  private def batchFiles(storeDir: String,
      excludeBatchId: Option[String]): Array[String] = {
    val dir = new java.io.File(storeDir)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") &&
        !excludeBatchId.contains(f.getName.stripSuffix(".parquet")))
      .map(_.getPath)
  }

  /** All content hashes currently in the store (empty frame if none).
    * `excludeBatchId` leaves one batch's own file out of the scan — the
    * dedup feed for a replay of that same batch (see [[appendBatch]]).
    */
  def processedHashes(spark: SparkSession, storeDir: String,
      excludeBatchId: Option[String] = None): DataFrame = {
    val files = batchFiles(storeDir, excludeBatchId)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(hashCol, StringType))))
    else
      spark.read.parquet(files.toIndexedSeq: _*).select(col(hashCol)).distinct()
  }

  /** Distinct record ids currently in the store (column-pruned scan,
    * same shape as [[processedHashes]]) — lets a caller distinguish "this
    * id's content is in the store" (ingested, possibly by a crashed run
    * whose metadata write never landed) from "this id duplicated another
    * record's content" (skipped).
    */
  def storedIds(spark: SparkSession, storeDir: String,
      idCol: String = "doc_id"): DataFrame = {
    val files = batchFiles(storeDir, None)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(idCol, org.apache.spark.sql.types.LongType))))
    else
      spark.read.parquet(files.toIndexedSeq: _*).select(col(idCol)).distinct()
  }

  /** Append one ingest batch: hash the content column, drop records whose
    * hash exists in the store or earlier in this batch (keep min id — the
    * reference keeps first-seen), write `<batchId>.parquet`. Returns the
    * number of newly written records.
    *
    * The dedup scan EXCLUDES `<batchId>.parquet` itself, so replaying a
    * batchId with the same feed is idempotent (the file is rewritten with
    * identical content — the crash-recovery path) instead of throwing
    * Spark's overwrite-a-read-path error. Reusing a batchId for a
    * DIFFERENT feed replaces that batch's rows; IncrementalRun.run guards
    * against doing that to a completed batch.
    */
  def appendBatch(records: DataFrame, storeDir: String, batchId: String,
      idCol: String = "doc_id", contentCol: String = "text"): Long = {
    val spark = records.sparkSession
    val hashed = records.withColumn(hashCol, sha2(col(contentCol), 256))

    // in-batch dedup: keep the first (min id) row per hash
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hashCol)).orderBy(col(idCol))
    val firstPerHash = hashed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")

    val fresh = firstPerHash.join(
      processedHashes(spark, storeDir, Some(batchId)), Seq(hashCol), "left_anti")

    val n = fresh.count()
    if (n > 0) {
      fresh
        .withColumn("date_processed", lit(batchId))
        .coalesce(1) // one file per batch, matching the reference layout
        .write.mode(SaveMode.Overwrite)
        .option("compression", "zstd")
        .parquet(s"$storeDir/$batchId.parquet")
    }
    n
  }

  /** Store-wide uniqueness audit (check_unique_hashes.py:9-78). */
  def audit(spark: SparkSession, storeDir: String): DataFrame = {
    processedHashes(spark, storeDir) // touch to validate layout
    val all = spark.read.parquet(storeDir + "/*.parquet")
    all.agg(
      count(lit(1)).as("total_hashes"),
      countDistinct(col(hashCol)).as("unique_hashes"),
      (count(lit(1)) - countDistinct(col(hashCol))).as("duplicate_count"))
  }
}
