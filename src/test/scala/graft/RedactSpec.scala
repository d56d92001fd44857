package graft

import graft.operators.{Redact, RedactRule}

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("pii rules scrub planted email/ssn/ip/phone and count per rule") {
    val docs = Seq(
      (1L, "contact jane.doe+x@example-mail.com or bob@corp.io today"),
      (2L, "ssn 123-45-6789 phone +1 (415) 555-2671 done"),
      (3L, "server 10.0.0.1 backup 192.168.255.254 port open"),
      (4L, "no pii here at all")).toDF("doc_id", "text")
    val out = Redact.redactOf(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_email"), r.getAs[Int]("n_ssn"),
          r.getAs[Int]("n_ipv4"), r.getAs[Int]("n_phone"),
          r.getAs[String]("redacted"))).toMap

    assert(out(1L)._1 == 2 && out(1L)._5 ==
      "contact <EMAIL> or <EMAIL> today", out(1L).toString)
    // SSN runs before phone, so the structured form wins; the remaining
    // digit run is the phone's.
    assert(out(2L)._2 == 1 && out(2L)._4 == 1 &&
      out(2L)._5 == "ssn <SSN> phone <PHONE> done", out(2L).toString)
    assert(out(3L)._3 == 2 &&
      out(3L)._5 == "server <IP> backup <IP> port open", out(3L).toString)
    assert(out(4L) == ((0, 0, 0, 0, "no pii here at all")))
    // The scrub invariant production cares about: no digits and no '@'
    // survive anywhere in the redacted text.
    assert(out.values.forall(v => !v._5.exists(_.isDigit) && !v._5.contains("@")))
  }

  test("rules are sequential: a later rule never sees earlier rules' spans") {
    val docs = Seq((1L, "id 123-45-6789")).toDF("doc_id", "text")
    // Reversed precedence: the generic phone digit-run consumes the SSN
    // before the SSN rule gets a turn — proving order IS the semantics
    // (and why piiRules pins ssn before phone).
    val reversed = Seq(Redact.piiRules(3), Redact.piiRules(1))
    val r = Redact.redactOf(docs, "text", reversed).collect()(0)
    assert(r.getAs[Int]("n_phone") == 1 && r.getAs[Int]("n_ssn") == 0)
    assert(r.getAs[String]("redacted") == "id <PHONE>")
  }

  test("per-source audit rollup and duplicate-name rejection") {
    val docs = Seq(
      (1L, "a", "x@y.io and z@w.io"), (2L, "a", "clean"),
      (3L, "b", "one 1.2.3.4 here")).toDF("doc_id", "source", "text")
    val audit = Redact.redactOf(docs, "text")
      .groupBy($"source")
      .agg(org.apache.spark.sql.functions.sum($"n_email").as("emails"),
        org.apache.spark.sql.functions.sum($"n_ipv4").as("ips"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit("a") == ((2L, 0L)) && audit("b") == ((0L, 1L)))
    intercept[IllegalArgumentException] {
      Redact.redactOf(docs, "text",
        Seq(RedactRule("x", "a", "b"), RedactRule("x", "c", "d")))
    }
  }

  test("fused redact_chain is field-identical to the composed regexp pair") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, lit, regexp_count, regexp_replace}
    // The pre-r18 composed form: regexp_count + regexp_replace per rule,
    // each a full scan. The fused expression must reproduce it FIELD FOR
    // FIELD — counts, rewritten text, nulls — on the real corpus and on
    // hostile strings, including a $-group-reference replacement (Spark's
    // RegExpReplace passes replacements through appendReplacement raw).
    def composed(df: DataFrame, rules: Seq[RedactRule]): DataFrame =
      rules.foldLeft(df.withColumn("redacted", col("text"))) { (d, r) =>
        d.withColumn(s"n_${r.name}",
            regexp_count(col("redacted"), lit(r.pattern)))
          .withColumn("redacted",
            regexp_replace(col("redacted"), r.pattern, r.repl))
      }
    val hostile = Seq(
      (9001L, null.asInstanceOf[String]),
      (9002L, ""),
      (9003L, "价格 123-45 єmail@пошта.укр \\ $5 end"),
      (9004L, "a@b.io 1.2.3.4 123-45-6789 +1 415 555 2671")
    ).toDF("doc_id", "text")
    val corpus = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").unionAll(hostile)
    val rulesets = Seq(
      Redact.piiRules, Redact.corpusRules,
      Seq(RedactRule("swap", "([0-9]+)-([0-9]+)", "$2_$1")))
    for (rules <- rulesets) {
      val cols = (Seq("doc_id") ++ rules.map(r => s"n_${r.name}") ++
        Seq("redacted")).map(col)
      val a = Redact.redactOf(corpus, "text", rules)
        .select(cols: _*).orderBy($"doc_id").collect().toSeq
      val b = composed(corpus, rules)
        .select(cols: _*).orderBy($"doc_id").collect().toSeq
      assert(a == b, s"fused != composed for ${rules.map(_.name)}")
    }
  }

  test("t23 corpus query: counts vary, email column is all-zero, digests stable") {
    val out = Redact.piiRedact(spark, sf).collect()
    assert(out.length == 500)
    assert(out.forall(_.getAs[Int]("n_email") == 0))
    val totals = out.map(_.getAs[Int]("n_total"))
    assert(totals.sum > 0 && totals.distinct.length > 1,
      "entity/op rules must actually hit the corpus with varying counts")
  }
}
