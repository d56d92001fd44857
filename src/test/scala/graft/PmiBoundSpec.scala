package graft

import org.apache.spark.sql.functions._
import graft.pipeline.DocumentPipeline

/** t18's scale contract: the pair self-join input is bounded by the
  * top-df `vocab` parameter IN CODE — a single pathological document
  * with 10k distinct tokens must not put ~5×10⁷ pairs into one task
  * (VERDICT r4 "What's wrong #1").
  */
class PmiBoundSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus = 40 small docs over a 20-word shared vocabulary plus ONE
    * pathological doc with 10,000 distinct tokens that appear nowhere
    * else (df=1 each — exactly the web-corpus long-tail case).
    */
  private lazy val corpus = {
    val small = (0 until 40).map { i =>
      val ws = (0 until 8).map(j => s"w${(i + j * 3) % 20}").mkString(" ")
      (i.toLong, ws)
    }
    val monster = (40L, (0 until 10000).map(j => s"rare$j").mkString(" "))
    (small :+ monster).toDF("doc_id", "text")
  }

  test("t18: pathological doc contributes at most `vocab` tokens to the pair join") {
    val vocab = 100
    val bounded = DocumentPipeline.pmiVocabTokens(corpus, vocab)
    // global bound: every doc's pair-side tokens ≤ vocab
    val perDoc = bounded.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .agg(max($"n")).as[Long].collect()(0)
    assert(perDoc <= vocab,
      s"a doc feeds $perDoc tokens into the self-join; bound is $vocab")
    // the monster doc specifically: its 10k df=1 tokens lose the top-df
    // cutoff to the 20 shared words, so pairs from it are ≤ vocab²/2,
    // not ~5×10⁷
    val monsterToks = bounded.filter($"doc_id" === 40L).count()
    assert(monsterToks <= vocab.toLong,
      s"monster doc contributes $monsterToks tokens (bound $vocab)")
  }

  test("t18: vocabulary cutoff is deterministic and df-ranked") {
    val bounded = DocumentPipeline.pmiVocabTokens(corpus, 20)
    val kept = bounded.select($"w").distinct().as[String].collect().toSet
    // exactly the 20 shared words (df ≥ 2 each) out-rank every df=1 token
    assert(kept == (0 until 20).map(i => s"w$i").toSet,
      s"expected the 20 shared words, got ${kept.take(30)}")
  }

  test("t18: pmiCooccurOf completes on the pathological corpus and pairs are vocab-bounded") {
    val vocab = 50
    val out = DocumentPipeline.pmiCooccurOf(corpus, minPairDf = 2,
      top = 10000, vocab = vocab)
    val rows = out.collect()
    // output pairs can never exceed vocab·(vocab−1)/2 regardless of the
    // monster doc
    assert(rows.length <= vocab * (vocab - 1) / 2)
    // and no rare-token pair survives the df cutoff
    assert(rows.forall(r => !r.getString(0).startsWith("rare")
      && !r.getString(1).startsWith("rare")))
  }

  test("t18: full-vocab result over sf data is unchanged by a non-binding bound") {
    // with vocab ≥ |vocabulary| the semi-join keeps everything: result
    // must equal the mathematical PMI top-50 (regression guard that the
    // bound is a restriction, not a semantics change)
    val docs = Tables.documents(spark, sf)
    val loose = DocumentPipeline.pmiCooccurOf(docs, vocab = 1000000)
    val tight = DocumentPipeline.pmiCooccurOf(docs, vocab = 2000)
    val l = loose.collect().map(_.toString).sorted
    val nDistinct = docs.select(explode(array_distinct(split($"text", " "))))
      .distinct().count()
    if (nDistinct <= 2000) {
      val t = tight.collect().map(_.toString).sorted
      assert(l.sameElements(t), "bound altered the result despite not binding")
    }
    assert(l.nonEmpty)
  }
}
