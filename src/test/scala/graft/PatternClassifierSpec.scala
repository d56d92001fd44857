package graft

import org.apache.spark.sql.functions._
import graft.operators.PatternClassifier

class PatternClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    (1, "\\burgent\\b", "urgent"),
    (2, "\\breport\\b", "report"),
    (3, "\\bmemo\\b", "memo"))

  test("first match wins by priority, not rule-table order") {
    val shuffled = Seq(rules(2), rules(0), rules(1)) // memo, urgent, report
      .toDF("priority", "pattern", "label")
    val docs = Seq(
      (1L, "an urgent report about the memo"), // all three match -> urgent
      (2L, "quarterly report and a memo"),     // report beats memo
      (3L, "just a memo"),
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val got = PatternClassifier.classify(docs, "text", shuffled)
      .select($"doc_id", $"doc_type").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "urgent", 2L -> "report", 3L -> "memo", 4L -> "other"))
  }

  test("empty rule table classifies everything as the default") {
    val empty = Seq.empty[(Int, String, String)].toDF("priority", "pattern", "label")
    val docs = Seq((1L, "anything")).toDF("doc_id", "text")
    val got = PatternClassifier.classify(docs, "text", empty, default = "unknown")
      .select($"doc_type").as[String].head()
    assert(got == "unknown")
  }

  test("q08 table-driven classifier matches the original CASE semantics") {
    import spark.implicits.{newProductEncoder => _, _}
    val docs = Seq(
      (1L, "a stream and a window"), // stream outranks window
      (2L, "window then join"),
      (3L, "join plus agg"),
      (4L, "agg only"),
      (5L, "plain text")).toDF("doc_id", "text")
    val rulesDf = pipeline.DocumentPipeline.docTypeRules
      .toDF("priority", "pattern", "label")
    val got = PatternClassifier.classify(docs, "text", rulesDf)
      .select($"doc_id", $"doc_type").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "streaming", 2L -> "windowed", 3L -> "join",
      4L -> "aggregation", 5L -> "other"))
  }
}
