package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.JsonExport

class JsonExportSpec extends SparkSpec {
  import spark.implicits._

  test("json export round-trips and partitions by key prefix") {
    val out = Files.createTempDirectory("graft_json_").toString
    val df = Tables.documents(spark, sf)
      .select($"doc_id", sha2($"text", 256).as("content_hash"), $"lang")
      .limit(100)
    JsonExport.perRecord(df, out, "content_hash")
    val back = spark.read.json(s"$out")
    assert(back.count() == 100)
    // prefix dirs exist and records are addressable by their prefix
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("_prefix="))
    assert(dirs.nonEmpty)
  }
}
