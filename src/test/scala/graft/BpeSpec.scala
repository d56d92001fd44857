package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{bpe, GraftFunctions}

/** BPE tokenization (t25 + the p02 opt-in counter): hand-computed merge
  * sequences, encode/roundtrip invariants, determinism, and packing
  * parity — the rows-only verification contract (a trained merge table
  * is not SQL-portable).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training learns the hand-computed merge sequence") {
    // Corpus: "aaab" ×10, "aab" ×5. Pair counts round 1:
    //   (a,a): 2·10 + 1·5 = 25 ; (a,b): 10 + 5 = 15 → merge (a,a).
    // Round 2 over {aa,a,b}×10, {aa,b}×5:
    //   (aa,a): 10 ; (a,b): 10 ; (aa,b): 5 → tie 10 broken
    //   lexicographically: (a,b) < (aa,a) → merge (a,b).
    val merges = bpe.train(Seq(("aaab", 10L), ("aab", 5L)), 2)
    assert(merges == Seq(("a", "a"), ("a", "b")),
      s"unexpected merges: $merges")
    val ranks = bpe.rankMap(merges)
    // "aaab" → [aa, a, b] → (a,b) merges → [aa, ab]
    assert(bpe.encodeWord("aaab", ranks).toSeq == Seq("aa", "ab"))
    // "aab" → [aa, b]; (aa,b) was never learned
    assert(bpe.encodeWord("aab", ranks).toSeq == Seq("aa", "b"))
    // unseen symbols stay code-point tokens
    assert(bpe.encodeWord("xyz", ranks).toSeq == Seq("x", "y", "z"))
  }

  test("training stops when no pair repeats and is deterministic") {
    val once = bpe.train(Seq(("abcd", 1L)), 100)
    assert(once.isEmpty, s"hapax pairs must not merge: $once")
    val a = bpe.train(Seq(("low", 5L), ("lower", 3L), ("lowest", 2L)), 50)
    val b = bpe.train(Seq(("lowest", 2L), ("low", 5L), ("lower", 3L)), 50)
    assert(a == b, "training must not depend on input order")
    assert(a.take(2).toSet.contains(("l", "o")) || a.head == ("l", "o"),
      s"'lo' appears 10 times — must merge early: $a")
  }

  test("encode roundtrip: tokens concatenate back to the words") {
    val docs = Tables.documents(spark, sf).limit(50)
    val merges = operators.Bpe.trainMerges(Tables.documents(spark, sf),
      nMerges = 100, sampleDocs = 100)
    assert(merges.nonEmpty)
    val rows = docs
      .select($"text", GraftFunctions.bpe_tokens($"text", merges).as("toks"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val toks = r.getSeq[String](1)
      assert(toks.mkString("") == text.split(" ", -1).mkString(""),
        "BPE is a segmentation: concatenated tokens must equal the text")
    }
  }

  test("t25 fertility: bpe count is between word count and char count") {
    val out = operators.Bpe.bpeTokenStats(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", length(coalesce($"text", lit(""))).as("nc"))
      .as[(Long, Int)].collect().toMap
    out.foreach { r =>
      val (id, ws, bpeN) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // each word is >= 1 token (so bpe >= ws over non-empty words) and
      // tokens can never outnumber code points
      assert(bpeN >= ws - 1, s"doc $id: bpe $bpeN < words $ws")
      assert(bpeN <= docs(id), s"doc $id: bpe $bpeN > chars ${docs(id)}")
      val fert = r.getDouble(3)
      if (ws > 0)
        assert(math.abs(fert - (bpeN.toDouble / ws + 1e-9)) < 1e-3)
    }
    // a trained table must actually compress: corpus-wide fertility
    // strictly below the untrained ceiling (every word split to chars)
    val totB = out.map(_.getLong(2)).sum.toDouble
    val totW = out.map(_.getLong(1)).sum.toDouble
    assert(totB / totW < 3.0, s"fertility ${totB / totW} — table untrained?")
  }

  test("p02 opt-in: packing budgets follow the BPE counts exactly") {
    val docs = Seq(
      (1L, "a", "xx yy zz"),          // 3 words
      (2L, "a", "xx xx xx xx"),
      (3L, "a", "qq ww ee rr tt")
    ).toDF("doc_id", "source", "text")
    val merges = Seq(("x", "x"), ("y", "y"))  // xx→1 token, yy→1, rest→2
    // counts: doc1 = 1 + 1 + 2 = 4 ; doc2 = 4·1 = 4 ; doc3 = 5·2 = 10
    val packed = pipeline.DocumentPipeline
      .sequencePackBpe(docs, merges, budget = 8, shards = 1)
      .orderBy($"seq_id").collect()
    val total = packed.map(_.getAs[Long]("seq_tokens")).sum
    assert(total == 18L, s"BPE total must be 4+4+10=18, got $total")
    // whitespace packing sees 3+4+5=12 tokens — different budget math
    val ws = pipeline.DocumentPipeline
      .sequencePackOf(docs, budget = 8, shards = 1).collect()
    assert(ws.map(_.getAs[Long]("seq_tokens")).sum == 12L)
  }
}
