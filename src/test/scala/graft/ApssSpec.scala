package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

import graft.operators.Apss

/** All-pairs similarity search: the prefix filter must be LOSSLESS (equal
  * to brute force) at every threshold, not just the oracled 0.9, and the
  * filter must actually prune the candidate space.
  */
class ApssSpec extends SparkSpec {
  import spark.implicits._

  // Mixed corpus: two exact dups, one word-swap near-dup pair, one
  // reordering (cosine 1.0 — bag-of-words), distinct background docs.
  private lazy val corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon theta"),
    (3L, "zeta epsilon delta gamma beta alpha"),
    (4L, "kappa lambda mu nu xi omicron"),
    (5L, "kappa lambda mu nu xi pi"),
    (6L, "rho sigma tau upsilon phi chi"),
    (7L, "psi omega alef bet gimel dalet"),
    (8L, "alpha kappa rho psi zeta pi"),
    (9L, "unique singular sole only lone one")
  ).toDF("doc_id", "text")

  /** Brute force over ALL pairs sharing any term — no prefix filter. */
  private def brute(docs: DataFrame, minCos: Double): Set[(Long, Long, Double)] = {
    val terms = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter(length($"term") >= 3)
    val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfw = terms.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val n = terms.select($"doc_id").distinct().count()
    val w = tf.join(dfw, Seq("term"))
      .withColumn("w", $"tf" * log(lit(n.toDouble) / $"df"))
    val nrm = w.groupBy($"doc_id").agg(sqrt(sum($"w" * $"w")).as("nrm"))
    val wn = w.join(nrm, Seq("doc_id")).filter($"nrm" > 0)
      .select($"doc_id", $"term", ($"w" / $"nrm").as("wn"))
    val a = wn.select($"doc_id".as("doc_a"), $"term", $"wn".as("wa"))
    val b = wn.select($"doc_id".as("doc_b"), $"term", $"wn".as("wb"))
    a.join(b, Seq("term")).filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(round(sum($"wa" * $"wb") + lit(1e-9), 6).as("cos"))
      .filter($"cos" >= minCos)
      .as[(Long, Long, Double)].collect().toSet
  }

  test("prefix-filtered result equals brute force at several thresholds") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val got = Apss.cosineApssOf(corpus, minCos = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == brute(corpus, t), s"mismatch at threshold $t")
    }
  }

  test("exact dups and bag-of-words reorderings score 1.0; near-dups high") {
    val got = Apss.cosineApssOf(corpus, minCos = 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got((0L, 1L)) == 1.0)
    assert(got((0L, 3L)) == 1.0) // reorder: identical bag of words
    assert(got((1L, 3L)) == 1.0)
    assert(got((0L, 2L)) > 0.5 && got((0L, 2L)) < 1.0) // one word swapped
    assert(!got.contains((6L, 7L))) // disjoint vocab: no shared term
  }

  test("the prefix index is a strict subset of the postings at high thresholds") {
    val terms = corpus.select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter(length($"term") >= 3)
    val full = terms.count()
    // Reconstruct the operator's prefix postings by running its pipeline
    // pieces: every doc here has uniform weights, so at t=0.9 the suffix
    // holds floor((0.899^2) * 6) = 4 of 6 terms and the prefix exactly 2.
    val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfw = terms.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val n = terms.select($"doc_id").distinct().count()
    val w = tf.join(dfw, Seq("term"))
      .withColumn("w", $"tf" * log(lit(n.toDouble) / $"df"))
    val nrm = w.groupBy($"doc_id").agg(sqrt(sum($"w" * $"w")).as("nrm"))
    val wn = w.join(nrm, Seq("doc_id")).filter($"nrm" > 0)
      .select($"doc_id", $"term", ($"w" / $"nrm").as("wn"))
    val cum = sum($"wn" * $"wn").over(
      org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"wn".asc, $"term".asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow))
    val slacked = 0.9 - 1e-3
    val prefix = wn.withColumn("cum", cum)
      .filter($"cum" >= slacked * slacked).count()
    assert(prefix < full / 2,
      s"prefix $prefix should prune more than half of $full postings")
  }

  test("sorted_weighted_dot merge walk matches a hash-join dot product") {
    val df = Seq((
      Seq("ant", "bee", "cow"), Seq(0.5, 0.5, 0.2),
      Seq("bee", "cow", "dog"), Seq(0.1, 0.3, 0.9)
    )).toDF("ta", "wa", "tb", "wb")
    val got = df.select(
      GraftFunctions.sorted_weighted_dot($"ta", $"wa", $"tb", $"wb"))
      .head.getDouble(0)
    assert(math.abs(got - (0.5 * 0.1 + 0.2 * 0.3)) < 1e-12)
    // Disjoint and empty inputs produce 0.0, not an error.
    val zero = Seq((Seq("ant"), Seq(1.0), Seq.empty[String], Seq.empty[Double]))
      .toDF("ta", "wa", "tb", "wb")
      .select(GraftFunctions.sorted_weighted_dot($"ta", $"wa", $"tb", $"wb"))
      .head.getDouble(0)
    assert(zero == 0.0)
  }

  test("empty corpus yields an empty pair set, not an error") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Apss.cosineApssOf(empty).count() == 0)
  }
}
