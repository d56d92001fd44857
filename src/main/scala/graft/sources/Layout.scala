package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators (SURVEY.md §5): the storage-side half of
  * "minimize shuffles" — bucketing for co-located joins, date partitioning
  * for pruning, and small-file compaction for the incremental store.
  */
object Layout {

  /** Write a frame as a bucketed table so future equi-joins/aggs on
    * `bucketCol` need no exchange. (saveAsTable — bucket metadata lives in
    * the session catalog; at cluster scale this is the managed-table path.)
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Write date-partitioned parquet (hive-style directories) so date
    * predicates become PartitionFilters — pruned before any I/O.
    */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("_date")
      .parquet(path)

  /** Compact an incremental store's many small batch files into `target`
    * files (the reference accumulates one parquet per ingest run —
    * unbounded file count kills scan planning at scale). Content and
    * hash-uniqueness are preserved; the compacted store replaces the dir.
    */
  def compactStore(spark: SparkSession, storeDir: String, target: Int = 4): Long = {
    val all = spark.read.parquet(storeDir + "/*.parquet")
    val n = all.count()
    val tmp = storeDir + "_compacting"
    all.repartition(target)
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(tmp + "/compacted.parquet")
    val dir = new java.io.File(storeDir)
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => deleteRec(f))
    new java.io.File(tmp).listFiles().foreach { f =>
      f.renameTo(new java.io.File(dir, f.getName))
    }
    new java.io.File(tmp).delete()
    n
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }
}
