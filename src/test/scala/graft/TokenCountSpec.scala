package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{hashing, GraftFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** The r15 allocate-to-count rewrites: WsTokenCount and BpeishTokenCount
  * must be bit-identical to the regex forms they replaced —
  * `size(split(text, "\s+"))` and
  * `size(regexp_extract_all(text, "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))` —
  * on every edge the regex semantics encode: leading/trailing/multiple
  * whitespace (Spark split keeps empty fields at limit -1), every Java
  * `\s` class member, empty strings, multi-byte code points (one "other"
  * match per code point, surrogate pairs included), and the real corpus.
  */
class TokenCountSpec extends SparkSpec {
  import spark.implicits._

  private val edgeDocs = Seq(
    "plain words here",
    "  leading", "trailing  ", "  both  ", " ",
    "", "a", " \t\r\n\u000B\u000C",
    "tabs\tand\nnewlines\u000Bvt\u000Cff\rcr",
    "digits123mixed456runs", "123 456  789",
    "punct!@#$%^&*()_+-=[]{};':\",./<>?",
    "café naïve résumé",          // 2-byte letters → "other"
    "中文没有空格",           // 3-byte CJK run
    "emoji 😀😀 pair",            // 4-byte code points
    "a1b2c3", "ABC abc 007 --- \u00A0nbsp",           // nbsp is NOT Java \s
    "word, word. word; (word)"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    .select($"doc_id", $"text")

  test("WsTokenCount ≡ size(split(text, \\s+)) on edges and corpus") {
    for (df <- Seq(edgeDocs.toDF("doc_id", "text"), corpus)) {
      val bad = df.select(
          GraftFunctions.ws_token_count($"text").as("a"),
          size(split($"text", "\\s+")).as("b"))
        .filter($"a" =!= $"b").count()
      assert(bad == 0)
    }
    // kernel-level spot pins (the +1 formula's corners)
    def k(s: String) = hashing.wsTokenCount(UTF8String.fromString(s))
    assert(k("") == 1)
    assert(k(" ") == 2)
    assert(k("a b") == 2)
    assert(k(" a b ") == 4)
    assert(k("abc") == 1)
  }

  test("BpeishTokenCount ≡ size(regexp_extract_all(...)) on edges and corpus") {
    val pat = lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")
    for (df <- Seq(edgeDocs.toDF("doc_id", "text"), corpus)) {
      val bad = df.select(
          GraftFunctions.bpeish_token_count($"text").as("a"),
          size(regexp_extract_all($"text", pat, lit(0))).as("b"))
        .filter($"a" =!= $"b").count()
      assert(bad == 0)
    }
    def k(s: String) = hashing.bpeishTokenCount(UTF8String.fromString(s))
    assert(k("") == 0)
    assert(k("abc") == 1)
    assert(k("abc123") == 2)          // letter run + digit run
    assert(k("a,b") == 3)
    assert(k("中文") == 2)    // one match per CJK code point
    assert(k("😀") == 1)    // surrogate pair = one code point
    assert(k("a\u00A0b") == 3)        // nbsp: other (not \s), splits runs
  }

  test("space_token_count ≡ size(split(text, ' ')) on every shape") {
    // the r16 byte-scan swap behind d10/t25/t26/p02/p03: split on the
    // single space char yields (#spaces + 1) elements, empties included
    val rows = Seq("", " ", "  ", "a", "a b", "a  b", " a b ",
      "tabs\tstay inside tokens", "中文 mixed 内容", "trailing ")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .unionByName(Tables.documents(spark, sf).select($"doc_id", $"text"))
    val bad = rows.select(
        GraftFunctions.space_token_count($"text").as("a"),
        size(split($"text", " ")).as("b"))
      .filter($"a" =!= $"b").count()
    assert(bad == 0L)
  }

  test("md5_bucket_counts ≡ the per-token conv/substring/pmod family") {
    // the r16 p05 rewrite contract: the one-pass histogram must carry
    // exactly the buckets and counts of exploding split(text, ' ') and
    // hashing each occurrence through pmod(conv(substring(md5(w),1,15),
    // 16,10), buckets) — empties included ("" hashes to its bucket)
    val rows = Seq("", "a", "a a b", "multi  space", "trailing ",
      "中文 tokens here").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .unionByName(Tables.documents(spark, sf)
        .select($"doc_id" + 1000L, $"text").toDF("doc_id", "text")
        .filter($"doc_id" < 1100L))
    val fused = rows.select($"doc_id",
        explode(GraftFunctions.md5_bucket_counts($"text", 1024)).as("x"))
      .select($"doc_id", $"x.bkt".as("bkt"), $"x.n".as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val old = rows
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .select($"doc_id",
        pmod(conv(substring(md5($"w"), 1, 15), 16, 10).cast("long"),
          lit(1024L)).cast("int").as("bkt"))
      .groupBy($"doc_id", $"bkt").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(fused == old,
      s"diff: ${fused.toSet.diff(old.toSet).take(5)} / ${old.toSet.diff(fused.toSet).take(5)}")
  }

  test("null text null-propagates through both counters (pinned intent)") {
    // The regex forms they replaced return -1 for null text under the
    // legacy sizeOfNull flag; the byte-scan expressions null-propagate
    // (Spark 4 default size(null) semantics, and what the DuckDB oracle
    // SQL computes). Keep-gate filters behave identically \u2014 both -1 and
    // NULL fail `>= k` \u2014 but emitted token counts over null-text rows
    // are NULL by contract, pinned here so the divergence from the
    // legacy flag is intentional, not accidental (ADVICE r15).
    val df = Seq((1L, Some("two words")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
        GraftFunctions.ws_token_count($"text").as("ws"),
        GraftFunctions.bpeish_token_count($"text").as("bpe"),
        GraftFunctions.cjk_script_counts($"text").as("cjk"))
      .orderBy($"doc_id").collect()
    assert(out(0).getInt(1) == 2 && out(0).getInt(2) == 2)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3),
      s"null text must yield NULL counts: ${out(1)}")
    // and a null row still fails a keep-gate threshold, same as -1 did
    assert(df.filter(GraftFunctions.ws_token_count($"text") >= 1)
      .count() == 1)
  }
}
