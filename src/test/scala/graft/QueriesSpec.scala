package graft

/** Every declared query runs end-to-end on sf0.001 and is consistent with
  * its declaration (an oracle entry implies a queries entry).
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      // queries that must be non-empty on any sf
      val mustHaveRows = !Set("d02_dedup_minhash", "d02c_minhash_adaptive",
        "d03_dedup_simhash",
        "q04_antijoin_incremental", "q06_setdiff_audit").contains(name)
      if (mustHaveRows) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
