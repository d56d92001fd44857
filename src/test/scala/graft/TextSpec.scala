package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Text-analysis function semantics on controlled inputs. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is invariant to case and whitespace jitter") {
    val df = Seq(
      ("Hello,  World! 42", "hello world 42"),
      ("  spaced   out  ", "spaced out")).toDF("a", "b")
    val bad = df.select(
      (TextFunctions.fingerprint($"a") === TextFunctions.fingerprint($"b")).as("eq"))
      .as[Boolean].collect()
    assert(bad.forall(identity))
  }

  test("token counts match manual counts") {
    val df = Seq("one two  three", "a-b c! 12x").toDF("t")
    val got = df.select(
      TextFunctions.wsTokenCount($"t").as("ws"),
      TextFunctions.bpeTokenCount($"t").as("bpe"))
      .as[(Int, Int)].collect()
    assert(got(0) == ((3, 3)))
    // "a-b c! 12x" → bpe: a,-,b,c,!,12,x = 7; ws: 3
    assert(got(1) == ((3, 7)))
  }

  test("t19 ccnet buckets partition each language into ~equal terciles") {
    import org.apache.spark.sql.functions._
    val b = pipeline.DocumentPipeline.ccnetBuckets(spark, sf).collect()
    val byLang = b.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      assert(rows.map(_.getString(1)).toSet == Set("head", "middle", "tail"),
        s"$lang missing a bucket")
      val counts = rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      val total = counts.values.sum
      // terciles: each bucket within ±2 of total/3 (interpolation ties)
      counts.values.foreach(c =>
        assert(math.abs(c - total / 3.0) <= 2.0, s"$lang skewed: $counts"))
      // buckets are ordered by score: head's max <= middle's min etc.
      val byB = rows.map(r => r.getString(1) -> (r.getDouble(3), r.getDouble(4))).toMap
      assert(byB("head")._2 <= byB("middle")._1 + 1e-9)
      assert(byB("middle")._2 <= byB("tail")._1 + 1e-9)
    }
  }

  test("t20 classifier keep gate is the score's sign and prob is monotone in score") {
    val rows = pipeline.DocumentPipeline.classifierQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, p, k) = (r.getDouble(1), r.getDouble(2), r.getBoolean(3))
      assert(p > 0.0 && p < 1.0, s"prob $p out of (0,1)")
      if (s > 1e-6) assert(k, s"score $s must keep")
      if (s < -1e-6) assert(!k, s"score $s must drop")
    }
    val byScore = rows.map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    byScore.sliding(2).foreach {
      case Array((s1, p1), (s2, p2)) =>
        assert(p2 >= p1 - 1e-9, s"prob not monotone: ($s1,$p1) -> ($s2,$p2)")
      case _ =>
    }
  }

  test("t21 zipf slope is negative for every language over at most topK ranks") {
    val rows = pipeline.DocumentPipeline.zipfFit(spark, sf).collect()
    assert(rows.length == 5, "one row per language")
    rows.foreach { r =>
      assert(r.getLong(1) <= 200, "rank cutoff respected")
      assert(r.getDouble(2) < 0.0,
        s"${r.getString(0)}: frequency must decay with rank, slope ${r.getDouble(2)}")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "r2 in [0,1]")
    }
  }

  test("t22 each gopher rule fires on its planted violation and only there") {
    // One doc per failure mode + one clean keeper. minWords lowered to 5
    // so the planted docs stay readable; rule semantics are unchanged.
    val docs = Seq(
      (1L, "the table is a good of row scan and merge"),     // keep
      (2L, "the of is"),                                     // too few words
      (3L, "extraordinarily incomprehensible manifestations " +
           "uncharacteristically extraordinarily"),          // mean len > 10
      (4L, "row scan merge batch sort spark window value")   // no stopwords
    ).toDF("doc_id", "text")
    val got = pipeline.DocumentPipeline
      .gopherFilterOf(docs, minWords = 5).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
      .toMap
    assert(got(1L) == ((true, true, true, true)), s"keeper: ${got(1L)}")
    // "the of is": 3 words (< 5) AND mean word length 7/3 < 3 — two
    // rules fire; the stopword rule alone holds (3 kinds present).
    assert(got(2L) == ((false, false, true, false)), s"short: ${got(2L)}")
    assert(got(3L)._2 == false && got(3L)._4 == false, s"long words: ${got(3L)}")
    assert(got(4L) == ((true, true, false, false)), s"no stop: ${got(4L)}")
    // On sf data the composite gate must actually discriminate (not a
    // vacuous all-true/all-false rule set).
    val sfKeep = pipeline.DocumentPipeline.gopherFilter(spark, sf)
      .groupBy($"keep").count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(sfKeep.keySet == Set(true, false), s"gate is vacuous on sf: $sfKeep")
  }

  test("t20 map-side ClassifierTokenScore ≡ the exploded groupBy form") {
    // the r16 rewrite contract: Σ_w n_w·wgt(w) over distinct words IS
    // Σ_tokens wgt(token), both LONG sums, so the map-side pass must be
    // bit-identical to the old token-stream double groupBy — on the sf
    // corpus AND the degenerate rows (empty text → one empty token,
    // repeated tokens, multi-space runs → empty tokens between spaces)
    val crafted = Seq((9001L, ""), (9002L, "a a a the the zz"),
      (9003L, "x  y   z"), (9004L, "solo")).toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .unionByName(crafted)
    val neu = pipeline.DocumentPipeline.classifierQualityOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    // the pre-r16 pipeline, inline
    val wc = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("n"))
    val wgt = when(
      conv(substring(md5($"w"), 1, 1), 16, 10).cast("long") % 2 === 0,
      lit(1L)).otherwise(lit(-1L))
    val old = wc.groupBy($"doc_id")
      .agg((sum($"n" * wgt).cast("double") / sum($"n")).as("raw"))
      .select($"doc_id", round($"raw" + lit(1e-9), 6),
        round(lit(1.0) / (lit(1.0) + exp(lit(-4.0) * $"raw")) + lit(1e-9), 6),
        ($"raw" >= 0))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(neu.keySet == old.keySet)
    old.foreach { case (id, v) =>
      assert(neu(id) == v, s"doc $id: map-side ${neu(id)} != exploded $v")
    }
  }

  test("t22 mean_word_len length-minus-wsCount ≡ the regexp_replace form") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .unionByName(Seq((9001L, "tabs\tand\nnewlines  here"),
        (9002L, "汉字 text mixed 内容"), (9003L, "")).toDF("doc_id", "text"))
    val mismatch = docs.select(
        (length($"text") - org.apache.spark.sql.graft.GraftFunctions
          .whitespace_count($"text")).as("a"),
        length(regexp_replace($"text", "\\s+", "")).as("b"))
      .filter($"a" =!= $"b").count()
    assert(mismatch == 0L)
  }

  test("langid picks the profile with most stopword hits") {
    val df = Seq(
      "the cat and the dog of the house is big",
      "le chat et la maison une belle les jours",
      "der hund und die katze das haus ein tag").toDF("text")
    val scores = TextFunctions.langScores($"text")
    val got = df.select(TextFunctions.predictLang(scores).as("l"))
      .as[String].collect().toSeq
    assert(got == Seq("en", "fr", "de"))
  }
}
