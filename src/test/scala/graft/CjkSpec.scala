package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{hashing, GraftFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** CJK / whitespace-free fallback (VERDICT r14 #6): t26 script-aware
  * language ID, the adaptive token count, and d02c's char-shingle
  * near-dup path — planted unsegmented documents prove the whitespace
  * operators' blind spot is real AND that the fallback closes it, while
  * parity pins prove whitespace corpora are bit-identical to the
  * original operators.
  */
class CjkSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic han-char text: `n` chars drawn from a fixed alphabet
  // by an affine index walk (step coprime to the alphabet size so grams
  // vary), with optional substitutions at given positions.
  private val hanAlphabet =
    ("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得" +
     "就那要下以生会自着去之过家学对可她里后小么心多天而能好都然没日" +
     "于起还发成事只作当想看文无开手十用主行方又如前所本见经头面公同").toCharArray
  private def hanDoc(n: Int, step: Int, subs: Map[Int, Char] = Map.empty): String =
    (0 until n).map(i => subs.getOrElse(i,
      hanAlphabet((i * step + 7) % hanAlphabet.length))).mkString

  private val kanaTail = "ですかながらひとつものこと"
  private val hangulDoc = "한국어로 작성된 테스트 문서입니다 데이터 처리 엔진의 언어 감지 기능을 검증하는 자료"

  test("charShingleHashes: sorted-distinct contract + whitespace collapse") {
    val a = hashing.charShingleHashes(UTF8String.fromString("abcdefg"), 3)
    assert(a.numElements() == 5) // abc bcd cde def efg, all distinct
    val arr = (0 until a.numElements()).map(a.getLong)
    assert(arr == arr.sorted, "must be sorted for the merge-walk verify")
    // whitespace runs collapse to one space before gram extraction
    val b = hashing.charShingleHashes(UTF8String.fromString("ab   cd"), 3)
    val c = hashing.charShingleHashes(UTF8String.fromString("ab cd"), 3)
    assert((0 until b.numElements()).map(b.getLong) ==
      (0 until c.numElements()).map(c.getLong))
    // shorter than n → empty, not a crash
    assert(hashing.charShingleHashes(UTF8String.fromString("ab"), 3)
      .numElements() == 0)
  }

  test("whitespace density byte scan matches the regexp_replace form") {
    // the r15 WhitespaceCount rewrite contract: bit-identical to
    // round((length - length(regexp_replace(text,'\\s','')))/length, 6)
    // on every whitespace class Java \s covers, multi-byte text (no
    // ASCII aliasing inside UTF-8 sequences), and the degenerate rows
    val docs = Seq(
      (1L, "plain words here"),
      (2L, "tabs\tand\nnewlines\u000Bvt\u000Cff\rcr "),
      (3L, hanDoc(50, 7)),                       // no whitespace at all
      (4L, hanDoc(10, 3) + " " + kanaTail),      // multi-byte + spaces
      (5L, ""),                                  // empty
      (6L, " \t\r\n"),                           // all whitespace
      (7L, "caf\u00e9 na\u00efve r\u00e9sum\u00e9") // 2-byte latin
    ).toDF("doc_id", "text")
    val oldForm = round(
      (length($"text") - length(regexp_replace($"text", "\\s", "")))
        .cast("double") / greatest(length($"text"), lit(1)) + lit(1e-9), 6)
    val mismatches = docs
      .select(functions.TextFunctions.whitespaceDensity($"text").as("nw"),
        oldForm.as("old"))
      .filter($"nw" =!= $"old").count()
    assert(mismatches == 0)
    // and the adaptive count's non-ws char branch: length - wsCount
    val cntDiff = docs.select(
        (length($"text") - org.apache.spark.sql.graft.GraftFunctions
          .whitespace_count($"text")).as("a"),
        length(regexp_replace($"text", "\\s", "")).as("b"))
      .filter($"a" =!= $"b").count()
    assert(cntDiff == 0)
  }

  test("fused CjkScriptCounts matches the three regexp_replace script counts") {
    // the r15 fusion contract: one decode pass ≡ three
    // length(regexp_replace(text, "[^\p{IsXxx}]", "")) columns, on Han/
    // kana/hangul text, mixed-script docs, supplementary-plane chars
    // (𠀀 is script Han in plane 2), and whitespace/latin noise
    val docs = Seq(
      (1L, hanDoc(60, 7)),
      (2L, hanDoc(20, 3) + kanaTail + " latin tail 123"),
      (3L, hangulDoc),
      (4L, "pure latin text, no cjk at all"),
      (5L, ""),
      (6L, "𠀀𠀁 plane-2 han"), // U+20000 U+20001
      (7L, kanaTail + hangulDoc + hanDoc(10, 11))
    ).toDF("doc_id", "text")
    val old = Seq(
      functions.TextFunctions.scriptCharCount($"text", "\\p{IsHan}"),
      functions.TextFunctions.scriptCharCount($"text",
        "\\p{IsHiragana}\\p{IsKatakana}"),
      functions.TextFunctions.scriptCharCount($"text", "\\p{IsHangul}"))
    val fused = GraftFunctions.cjk_script_counts($"text")
    val mismatches = docs.select(
        element_at(fused, 1).as("h"), element_at(fused, 2).as("k"),
        element_at(fused, 3).as("g"),
        old(0).as("oh"), old(1).as("ok"), old(2).as("og"))
      .filter($"h" =!= $"oh" || $"k" =!= $"ok" || $"g" =!= $"og").count()
    assert(mismatches == 0)
  }

  test("fused CjkScriptCounts matches regexp form on MALFORMED UTF-8") {
    // ADVICE r15: the hand decoder must validate continuation bytes
    // (10xxxxxx) — a malformed lead must not swallow the valid bytes
    // after it. The regexp side decodes via String (malformed → U+FFFD,
    // not a CJK script), so equality on crafted byte sequences pins the
    // lenient-skip behavior. Binary → string cast keeps the raw bytes.
    val zhong = Array[Byte](0xE4.toByte, 0xB8.toByte, 0xAD.toByte) // 中
    val wen = Array[Byte](0xE6.toByte, 0x96.toByte, 0x87.toByte)   // 文
    val cases = Seq(
      // malformed 3-byte lead then ASCII: old code ate 'a','b'
      Array[Byte](0xE4.toByte, 'a', 'b', 'c'),
      // malformed lead directly before a valid Han char: the char must
      // still count (old code consumed its lead as a continuation)
      Array[Byte](0xE4.toByte) ++ zhong,
      // truncated sequence at end of string
      zhong ++ Array[Byte](0xE6.toByte, 0x96.toByte),
      // lone continuation byte between two valid chars
      zhong ++ Array[Byte](0x80.toByte) ++ wen,
      // 4-byte lead with only ASCII after it
      Array[Byte](0xF0.toByte, 'x', 'y'),
      // all-valid baseline
      zhong ++ wen
    ).zipWithIndex.map { case (b, i) => (i.toLong, b) }
    val docs = cases.toDF("doc_id", "b")
      .select($"doc_id", $"b".cast("string").as("text"))
    val old = Seq(
      functions.TextFunctions.scriptCharCount($"text", "\\p{IsHan}"),
      functions.TextFunctions.scriptCharCount($"text",
        "\\p{IsHiragana}\\p{IsKatakana}"),
      functions.TextFunctions.scriptCharCount($"text", "\\p{IsHangul}"))
    val fused = GraftFunctions.cjk_script_counts($"text")
    val rows = docs.select($"doc_id",
        element_at(fused, 1).as("h"), element_at(fused, 2).as("k"),
        element_at(fused, 3).as("g"),
        old(0).as("oh"), old(1).as("ok"), old(2).as("og"))
      .collect()
    for (r <- rows) {
      assert(r.getAs[Int]("h") == r.getAs[Int]("oh") &&
        r.getAs[Int]("k") == r.getAs[Int]("ok") &&
        r.getAs[Int]("g") == r.getAs[Int]("og"),
        s"malformed-input divergence on case ${r.getAs[Long]("doc_id")}: $r")
    }
    // the load-bearing case explicitly: 0xE4 + 中 still counts the 中
    assert(rows.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Int]("h") == 1)
  }

  test("t26: planted scripts label zh/ja/ko; segmented text matches t01") {
    val zh = hanDoc(120, 13)
    val ja = hanDoc(40, 11) + kanaTail * 4
    val docs = Seq(
      (1L, zh), (2L, ja), (3L, hangulDoc),
      (4L, "the state of the agency and of the public is good"),
      (5L, "le rapport de la commission et les agences une fois")
    ).toDF("doc_id", "text")
    // route through the same column logic as the registered t26 query
    val (han, kana, hang) = functions.TextFunctions.cjkCounts($"text")
    val wsDens = functions.TextFunctions.whitespaceDensity($"text")
    val scores = functions.TextFunctions.langScores($"text")
    val out = docs.select($"doc_id", han.as("n_han"), kana.as("n_kana"),
        hang.as("n_hangul"), wsDens.as("ws_density"),
        length($"text").as("n_cp"),
        functions.TextFunctions.adaptiveTokenCount($"text").as("n_adapt"),
        functions.TextFunctions.predictLang(scores).as("ws_lang"))
      .withColumn("predicted_lang",
        when(($"n_han" + $"n_kana" + $"n_hangul") * 2 > $"n_cp",
          when($"n_hangul" > greatest($"n_han", $"n_kana"), "ko")
            .when($"n_kana" > 0, "ja").otherwise("zh"))
          .otherwise($"ws_lang"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("predicted_lang"), r.getAs[Int]("n_adapt"))).toMap
    assert(out(1L)._1 == "zh"); assert(out(2L)._1 == "ja")
    assert(out(3L)._1 == "ko")
    assert(out(4L)._1 == "en"); assert(out(5L)._1 == "fr")
    // adaptive budgets: unsegmented → char count; segmented → word count
    assert(out(1L)._2 == 120, "zh doc = one ws token; adaptive must count chars")
    assert(out(4L)._2 == 11)
    // hangul doc has spaces (Korean is space-segmented) → word branch
    assert(out(3L)._2 == hangulDoc.split(" ").length)
  }

  test("t26 registered query ≡ t01 on a fully-segmented corpus") {
    val t01 = pipeline.DocumentPipeline.langid(spark, sf)
      .select($"doc_id", $"predicted_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val t26 = pipeline.DocumentPipeline.scriptLangid(spark, sf)
      .select($"doc_id", $"predicted_lang", $"n_han", $"n_kana",
        $"n_hangul").collect()
    assert(t26.nonEmpty)
    t26.foreach { r =>
      assert(r.getInt(2) == 0 && r.getInt(3) == 0 && r.getInt(4) == 0,
        "synthetic corpus is ASCII — script counts must be zero")
      assert(r.getString(1) == t01(r.getLong(0)),
        s"doc ${r.getLong(0)}: t26 ${r.getString(1)} != t01 ${t01(r.getLong(0))}")
    }
  }

  test("d02c finds planted CJK near-dups that word-shingle d02 is blind to") {
    val zhA = hanDoc(150, 13)
    val zhB = hanDoc(150, 13, Map(40 -> '雨', 90 -> '雪')) // 2 subs of 150
    val zhC = hanDoc(150, 29) // unrelated walk
    val enBase = (0 until 60).map(i => s"word${(i * 17 + 3) % 97}").mkString(" ")
    val enA = enBase
    val enB = enBase.split(" ").updated(10, "changed").mkString(" ")
    val docs = Seq(
      (1L, zhA), (2L, zhB), (3L, zhC), (10L, enA), (11L, enB)
    ).toDF("doc_id", "text")
    val adaptive = operators.Dedup.minhashPairsAdaptive(docs)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val wordOnly = operators.Dedup.minhashPairs(docs)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(adaptive.contains((1L, 2L)), s"CJK near-dup missed: $adaptive")
    assert(adaptive.contains((10L, 11L)), "segmented near-dup must survive")
    assert(!adaptive.contains((1L, 3L)) && !adaptive.contains((2L, 3L)),
      "unrelated CJK docs must not pair")
    assert(!wordOnly.contains((1L, 2L)),
      "word shingles see one-word docs — the blind spot this closes")
    assert(wordOnly.contains((10L, 11L)))
  }

  test("adaptive segment frame ≡ word segment frame on segmented text") {
    // the r16 segmentHashFrame swap's safety contract: where whitespace
    // density clears the threshold, SegmentShingleHashesAdaptive must be
    // BIT-identical to SegmentShingleHashes — boundaries, digest pair,
    // shingle hashes — so d18b / p07 / the stored segment index / the
    // streaming gate reproduce their pre-swap rows on segmented corpora.
    val rows = Seq(
      (1L, (0 until 37).map(i => s"tok${(i * 7 + 1) % 53}").mkString(" ")),
      (2L, "exactly ten words one two three four five six seven"),
      (3L, "short"), // 1 word, no whitespace → density 0 → CHAR route
      (4L, ""),      // empty → char route; must still be 1 empty segment
      (5L, "tabs\tand spaces  mixed\nacross lines with enough words here")
    ).toDF("doc_id", "text")
    val f = org.apache.spark.sql.graft.GraftFunctions
    val both = rows.select($"doc_id",
        f.segment_shingle_hashes($"text", 10, 3).cast("string").as("w"),
        f.segment_shingle_hashes_adaptive($"text", 10, 3, 6, 0.05)
          .cast("string").as("a"))
      .collect()
    both.filter(r => r.getLong(0) != 3L).foreach { r =>
      // doc 3 legitimately diverges only if longer than width chars —
      // "short" is 5 chars < 10, so BOTH routes yield the whole text as
      // one segment with the same digests (shingles: word route has <3
      // words → empty; char route has <6 chars → empty). Doc 4 (empty)
      // must agree too: one empty segment either way.
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: adaptive != word\n${r.getString(1)}\n${r.getString(2)}")
    }
    val short = both.find(_.getLong(0) == 3L).get
    assert(short.getString(1) == short.getString(2),
      "sub-width no-whitespace doc: both routes see the identical single segment")
  }

  test("d18b flags edited CJK boilerplate repeats after the adaptive swap") {
    // Each doc: unique 20-char prefix (2 char-segments at width 10) +
    // shared 40-char boilerplate P aligned on a segment boundary. Doc 2
    // repeats P with ONE substitution at the first char of P's second
    // segment (affects only 1 of that segment's 5 char-6-grams →
    // Jaccard 4/6 ≥ 0.5); its other 3 boilerplate segments are exact
    // digest dups. Word segmentation sees each doc as ONE whitespace
    // token — distinct digests, nothing flagged — which is precisely
    // the blind spot the swap closes.
    val p = hanDoc(40, 13)
    val pEdited = { val c = p.toCharArray; c(10) = '雨'; new String(c) }
    val docs = Seq(
      (1L, hanDoc(20, 29) + p),
      // step must be coprime to the 93-char (3×31) alphabet — 31 cycles
      // with period 3, making the prefix itself internally near-dup
      (2L, hanDoc(20, 41) + pEdited),
      (3L, hanDoc(60, 37))) // unrelated walk, same length
      .toDF("doc_id", "text")
    val rollup = operators.Dedup.segmentNeardupFullOf(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rollup(1L)._3 == 0L, "keeper doc must be clean")
    assert(rollup(2L)._2 == 6L, "20+40 chars at width 10 = 6 segments")
    assert(rollup(2L)._3 == 4L,
      s"3 exact + 1 edited boilerplate segment must flag (got ${rollup(2L)})")
    assert(rollup(2L)._4 < 0.5, "p07's segKeptRatioMin gate would kill it")
    assert(rollup(3L)._3 == 0L, "unrelated CJK doc must not flag")
  }

  test("segment delta probe flags CJK boilerplate against a stored index") {
    // store/probe ride the same adaptive frame by construction — a CJK
    // passage indexed at write time must be found by a later delta batch
    val p = hanDoc(40, 13)
    val corpus = Seq((1L, hanDoc(20, 29) + p)).toDF("doc_id", "text")
    operators.Dedup.writeSegmentIndex(corpus, "cjkseg_idx")
    val pEdited = { val c = p.toCharArray; c(10) = '雨'; new String(c) }
    val delta = Seq((100L, hanDoc(20, 41) + pEdited),
      (101L, hanDoc(60, 37))).toDF("doc_id", "text")
    val probed = operators.Dedup.segmentDelta(spark, "cjkseg_idx", delta)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(probed(100L)._3 == 4L,
      s"stored boilerplate (3 exact + 1 edited segs) must flag (got ${probed(100L)})")
    assert(probed(101L)._3 == 0L)
  }

  test("d02c ≡ d02 bit-identically on a fully-segmented corpus") {
    val docs = Tables.documents(spark, sf)
    val d02 = operators.Dedup.minhashPairs(docs)
      .as[(Long, Long, Double)].collect().toSet
    val d02c = operators.Dedup.minhashPairsAdaptive(docs)
      .as[(Long, Long, Double)].collect().toSet
    assert(d02 == d02c,
      s"adaptive path must be inert on segmented text: ${d02c.diff(d02)} / ${d02.diff(d02c)}")
    assert(d02.nonEmpty, "corpus has planted near-dups; empty = broken test")
  }
}
