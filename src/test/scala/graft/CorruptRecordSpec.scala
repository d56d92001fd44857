package graft

import java.nio.file.Files

/** Tolerant ingestion of messy feeds (the reference's downloads are
  * unreliable): PERMISSIVE JSON parsing isolates corrupt lines into
  * `_corrupt_record` instead of failing the job.
  */
class CorruptRecordSpec extends SparkSpec {
  import spark.implicits._

  test("permissive json read isolates corrupt rows; failfast rejects them") {
    val dir = Files.createTempDirectory("graft_json_in_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/feed.json"),
      """{"id": 1, "name": "ok"}
        |not json at all
        |{"id": 2, "name": "also ok"}
        |{"id": "three", "name": 3}
        |""".stripMargin)
    val df = spark.read
      .schema("id LONG, name STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record column requires a materialized referenced frame
    val good = df.filter($"_corrupt_record".isNull)
    val bad = df.filter($"_corrupt_record".isNotNull)
    assert(good.count() == 2)
    assert(bad.count() == 2) // the non-json line and the type-mismatched row
    val failfast = intercept[Exception] {
      spark.read.schema("id LONG, name STRING")
        .option("mode", "FAILFAST").json(dir).collect()
    }
    assert(failfast != null)
  }
}
