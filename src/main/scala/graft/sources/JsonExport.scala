package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Row-level JSON export (reference: website/export_parquet_to_json.py
  * writes one JSON file per document keyed by sha256).
  *
  * Spark-first shape: partitioned JSON-lines output, optionally bucketed by
  * a key prefix so a serving layer can locate a document's record without
  * listing millions of files — one-file-per-row does not survive 100 TB.
  */
object JsonExport {

  /** Write `df` as JSON lines, hash-prefix partitioned on `keyCol` so any
    * single key is addressable by computing its prefix.
    */
  def perRecord(df: DataFrame, outDir: String, keyCol: String,
      prefixLen: Int = 2): Unit =
    df.withColumn("_prefix", substring(col(keyCol), 0, prefixLen))
      .repartition(col("_prefix"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("_prefix")
      .json(outDir)
}
