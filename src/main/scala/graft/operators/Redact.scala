package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named redaction rule: every non-overlapping match of `pattern` in
  * the input is counted, then replaced with `repl`. Rules apply
  * SEQUENTIALLY — each rule sees the previous rule's output — so rule
  * order encodes precedence (e.g. the structured SSN pattern must run
  * before the general phone digit-run that would otherwise consume it).
  */
final case class RedactRule(name: String, pattern: String, repl: String)

/** Rule-based span redaction — the PII-scrubbing primitive of a training
  * -data pipeline (emails, phone numbers, addresses stripped before the
  * corpus ships) and the log-scrubbing primitive of an event pipeline.
  *
  * Scale shape: pure map — `regexp_count` + `regexp_replace` fold over
  * the scan with no shuffle, no UDF (both are codegen'd string
  * expressions), so redaction rides whatever partitioning the corpus
  * already has and composes with any downstream operator. Per-rule match
  * counts come out alongside the redacted text: the audit trail ("how
  * much PII did this source carry?") is a free partial-agg rollup away
  * (see the per-source form in the spec), not a second pass.
  *
  * The engine ships [[Redact.piiRules]] (email, SSN, IPv4, phone —
  * ordered so structured forms win over the generic digit run) as the
  * production default, proven on planted PII in RedactSpec. The oracled
  * corpus query (`t23_pii_redact`) demonstrates the same machinery with
  * rules that actually occur in the synthetic word-salad corpus — a
  * dictionary entity rule and an operator-word rule — PLUS the real
  * email rule riding the same path (provably zero matches corpus-wide:
  * the oracle checks the zeros too, so "nothing leaked AND nothing was
  * over-redacted" are both asserted cross-engine).
  */
object Redact {

  /** Production PII defaults. Order matters (sequential semantics):
    * email first (its local part may contain digits a later rule would
    * mangle), then SSN and IPv4 (structured digit forms), then the
    * generic phone digit-run that would otherwise swallow both.
    */
  val piiRules: Seq[RedactRule] = Seq(
    RedactRule("email",
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    RedactRule("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    RedactRule("ipv4",
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    RedactRule("phone",
      "\\+?\\b[0-9][0-9()\\- ]{6,}[0-9]\\b", "<PHONE>"))

  /** Apply `rules` sequentially to `textCol`: the result carries one
    * `n_<rule>` count column per rule (matches seen at that rule's turn,
    * i.e. after all earlier rules have already rewritten the text) and
    * `redacted`, the fully-scrubbed text. Map-only; no shuffle.
    *
    * The chain runs as ONE fused expression (`redact_chain`) that counts
    * while it rewrites — R matcher walks total instead of the composed
    * `regexp_count` + `regexp_replace` pair's 2R (each a full scan of
    * the same text). CollapseProject keeps the struct materialized once:
    * it never inlines a non-cheap producer referenced more than once, so
    * the field reads below stay field reads. RedactSpec pins the fused
    * output field-equal to the composed pair.
    */
  def redactOf(df: DataFrame, textCol: String,
      rules: Seq[RedactRule] = piiRules): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")
    val chained = df.withColumn("_rc",
      org.apache.spark.sql.graft.GraftFunctions.redact_chain(
        col(textCol), rules.map(_.pattern), rules.map(_.repl)))
    rules.zipWithIndex.foldLeft(chained) { case (d, (r, i)) =>
        d.withColumn(s"n_${r.name}", col("_rc").getField("ns").getItem(i))
      }
      .withColumn("redacted", col("_rc").getField("s"))
      .drop("_rc")
  }

  /** Rules that hit the synthetic corpus (dictionary entities + operator
    * words) with the real email rule along for the audited-zero check.
    */
  private[graft] val corpusRules = Seq(
    RedactRule("entity", "\\b(customer|supplier|part|order)\\b", "<ENT>"),
    RedactRule("op", "\\b(scan|merge|join|filter|sort)\\b", "<OP>"),
    piiRules.head)

  /** t23: redaction demo over the documents corpus — per-doc rule
    * counts, a digest of the scrubbed text (digest, not the text itself,
    * keeps the verify payload small while still pinning every replaced
    * byte), and the total. Oracled in DuckDB with the identical
    * sequential regexp pipeline.
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    redactOf(graft.Tables.documents(s, dir), "text", corpusRules)
      .select($"doc_id", $"n_entity", $"n_op", $"n_email",
        md5($"redacted").as("redacted_digest"),
        ($"n_entity" + $"n_op" + $"n_email").as("n_total"))
      .orderBy($"doc_id")
  }

  val piiRedactSql: String =
    """WITH r1 AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(text, '\b(customer|supplier|part|order)\b'))::INT AS n_entity,
      |    regexp_replace(text, '\b(customer|supplier|part|order)\b', '<ENT>', 'g') AS s
      |  FROM documents),
      |r2 AS (
      |  SELECT doc_id, n_entity,
      |    len(regexp_extract_all(s, '\b(scan|merge|join|filter|sort)\b'))::INT AS n_op,
      |    regexp_replace(s, '\b(scan|merge|join|filter|sort)\b', '<OP>', 'g') AS s
      |  FROM r1),
      |r3 AS (
      |  SELECT doc_id, n_entity, n_op,
      |    len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT AS n_email,
      |    regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s
      |  FROM r2)
      |SELECT doc_id, n_entity, n_op, n_email, md5(s) AS redacted_digest,
      |  (n_entity + n_op + n_email) AS n_total
      |FROM r3
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t23_pii_redact" -> ((s: SparkSession, d: String) => piiRedact(s, d)))

  val oracles: Map[String, String] = Map(
    "t23_pii_redact" -> piiRedactSql)
}
