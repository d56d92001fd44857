package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

/** Unit pins for the round-13 map-side expressions, independent of the
  * DuckDB oracles that cover them end-to-end: token semantics must match
  * `split(text, " ")` with limit -1 (empty tokens kept), and the
  * per-bucket union-find must reproduce transitive min-label components.
  */
class MapSideExprSpec extends SparkSpec {
  import spark.implicits._

  test("TokenVocabStats matches the exploded groupBy form token-for-token") {
    val docs = Seq(
      (1L, "a b a c a"),        // repeats
      (2L, ""),                  // empty text = ONE empty token
      (3L, "x  y"),              // double space = empty token inside
      (4L, "solo")
    ).toDF("doc_id", "text")
    val got = docs
      .select($"doc_id", GraftFunctions.token_vocab_stats($"text").as("v"))
      .select($"doc_id", $"v.n_tokens", $"v.vocab_size", $"v.n_hapax")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expected = docs
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("n"))
      .groupBy($"doc_id")
      .agg(sum($"n").as("nt"), count(lit(1)).as("vs"),
        sum(when($"n" === 1, 1L).otherwise(0L)).as("nh"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, s"got $got expected $expected")
    // the empty doc concretely: one empty token, vocab 1, hapax 1
    assert(got(2L) == ((1L, 1L, 1L)))
    assert(got(3L) == ((3L, 3L, 3L)), "x, <empty>, y are three distinct tokens")
  }

  test("WordCounts / BigramCounts equal the exploded count pipelines") {
    val docs = Seq((1L, "a b a b c"), (2L, "q"), (3L, "")).toDF("doc_id", "text")
    val wc = docs
      .select($"doc_id", explode(GraftFunctions.word_counts($"text")).as("wc"))
      .select($"doc_id", $"wc.w", $"wc.n")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val wcExp = docs
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(wc == wcExp)
    val bg = docs
      .select(explode(GraftFunctions.bigram_counts($"text")).as("b"))
      .select($"b.w1", $"b.w2", $"b.n")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc 1 bigrams: (a,b)x2, (b,a), (b,c); docs 2/3 have < 2 tokens
    assert(bg == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("b", "c") -> 1L))
  }

  test("OrderedPairs emits n(n-1)/2 ascending pairs") {
    val got = Seq(Tuple1(Seq(3L, 7L, 9L)), Tuple1(Seq(5L)), Tuple1(Seq.empty[Long]))
      .toDF("xs")
      .select(explode(GraftFunctions.ordered_pairs($"xs")).as("p"))
      .select($"p.a", $"p.b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 7L), (3L, 9L), (7L, 9L)))
  }

  test("ComponentLabels: transitive chains, disjoint components, min labels") {
    // edges: chain 5-2-9 (component min 2), pair 10-11, self-contained 7-7
    val edges = Seq(Tuple1(Seq((5L, 2L), (2L, 9L), (10L, 11L), (7L, 7L))))
      .toDF("es")
      .select(explode(GraftFunctions.component_labels(
        expr("transform(es, e -> struct(e._1 AS a, e._2 AS b))"))).as("l"))
      .select($"l.vec_id", $"l.cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edges == Map(5L -> 2L, 2L -> 2L, 9L -> 2L, 10L -> 10L,
      11L -> 10L, 7L -> 7L))
  }

  test("d12 per-bucket clustering merges a transitive chain inside a bucket") {
    // Three near-identical vectors (same sign bucket, pairwise cos >= .3)
    // plus one orthogonal-ish singleton: the per-bucket union-find must
    // label the trio by its min vec_id and leave the singleton alone.
    // Built through the public semanticClusters path at nprobe=1 via a
    // temp parquet dir so the probe covers bucket → pairs → labels.
    val dim = 64
    def vec(shift: Double): Seq[Double] =
      (0 until dim).map(i => if (i < 8) 1.0 + shift * (i % 3) else 0.01 * i)
    val tmp = java.nio.file.Files.createTempDirectory("graft_d12spec_").toString
    Seq(
      (1L, vec(0.00)), (2L, vec(0.01)), (3L, vec(0.02)),
      (9L, (0 until dim).map(i => if (i > 55) -1.0 else 0.0).toSeq)
    ).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = graft.operators.Dedup.semanticClusters(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false)) && out(3L) == ((1L, false)),
      s"trio must share cluster 1: $out")
    assert(out(9L) == ((9L, true)), "singleton is its own cluster")
  }
}
