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

  test("hyperplane probes: SQL arity enforced, NaN input degrades gracefully") {
    GraftExtensions.register(spark)
    // probe set agrees between SQL and Column surfaces
    val viaSql = spark.sql(
      "SELECT graft_hyperplane_probes(array(1.0d, -2.0d, 0.5d), 6, 3) AS p")
      .collect()(0).getSeq[Long](0)
    assert(viaSql.length == 3 && viaSql.distinct.length == 3,
      "home + 2 distinct single-bit flips expected")
    // nprobe is required — a silent default would quietly under-probe
    // (Scala callers use different values: s02b 8, d11b 3)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_hyperplane_probes(array(1.0d), 4)").collect()
    }
    assert(err.getMessage.contains("requires all three arguments") ||
      err.getCause != null)
    // one NaN component poisons every projection; the probe selection
    // must fall back to plane order, never crash the task
    val nan = org.apache.spark.sql.graft.hashing.hyperplaneProbes(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill(8)(Double.NaN)), 6, 4)
    assert(nan.numElements() == 4)
    val arr = nan.toLongArray()
    assert(arr(0) == 0L, "NaN > 0 is false: home signature all-zero")
    assert(arr.distinct.length == 4, "flips must hit distinct planes")
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
