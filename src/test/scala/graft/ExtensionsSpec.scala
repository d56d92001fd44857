package graft

import org.apache.spark.sql.graft.GraftExtensions

/** SQL surface of the custom expressions. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate like the Column API") {
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
      .createOrReplaceTempView("docs_ext")
    val row = spark.sql(
      """SELECT graft_simhash64(split(text, ' ')) AS fp,
        |       graft_word_shingles(text, 2) AS bg,
        |       graft_minhash_sig(graft_word_shingles(text, 3), 8) AS sig,
        |       graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
        |FROM docs_ext""".stripMargin).collect()(0)
    assert(row.getAs[Long]("fp") != 0L)
    assert(row.getSeq[String](row.fieldIndex("bg")).head == "the quick")
    assert(row.getSeq[Long](row.fieldIndex("sig")).length == 8)
    assert(row.getAs[Double]("dp") == 11.0)
    val row2 = spark.sql(
      """SELECT graft_winnow_fingerprints(graft_word_shingles(text, 3), 4) AS fp,
        |       graft_word_shingle_hashes(text, 3) AS sh,
        |       graft_minhash_sig_from_hashes(graft_word_shingle_hashes(text, 3), 8) AS sig,
        |       graft_sorted_intersection_size(
        |         graft_word_shingle_hashes(text, 3),
        |         graft_word_shingle_hashes(text, 3)) AS self_n
        |FROM docs_ext""".stripMargin).collect()(0)
    assert(row2.getSeq[Long](row2.fieldIndex("fp")).nonEmpty)
    val sh = row2.getSeq[Long](row2.fieldIndex("sh"))
    assert(sh == sh.sorted && sh.nonEmpty)
    assert(row2.getSeq[Long](row2.fieldIndex("sig")).length == 8)
    assert(row2.getAs[Int]("self_n") == sh.length)
  }

  test("SQL simhash agrees with the operator-level simhash") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_simhash64(split('a b c', ' ')) AS fp").as[Long].head()
    val viaCol = Seq("a b c").toDF("text")
      .select(operators.Dedup.simhash($"text").as("fp")).as[Long].head()
    assert(viaSql == viaCol)
  }
}
