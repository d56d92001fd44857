package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Fidelity checks for reference-derived normalization utilities. */
class ReferenceSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("generated filename matches the reference convention") {
    val df = Seq(("SAMARITAS - BAY", "Renewal Report/2023", "2023-02-21"))
      .toDF("agency", "title", "date")
    val got = df.select(generatedFilename($"agency", $"title",
      to_date($"date"))).as[String].head()
    assert(got == "samaritas_-_bay_renewal_report-2023_2023-02-21.pdf")
  }

  test("date suffix strip normalizes to the dateless key") {
    val df = Seq("agency_title_2023-02-21.pdf", "no_date_here.txt")
      .toDF("f")
    val got = df.select(stripDateSuffix($"f")).as[String].collect().toSeq
    assert(got == Seq("agency_title", "no_date_here.txt"))
  }

  test("violation level normalization covers reference variations") {
    val cases = Seq(
      "low" -> "low", "Moderate" -> "moderate", "SEVERE" -> "severe",
      "medium risk" -> "moderate", "very high" -> "severe",
      "lowish" -> "low", "unknown" -> "", "" -> "")
    val df = cases.map(_._1).toDF("level")
    val got = df.select(normalizeLevel($"level")).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }
}
