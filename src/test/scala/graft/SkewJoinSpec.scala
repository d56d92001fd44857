package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted join must be row-identical to the plain join. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on the lineitem-part key") {
    val li = Tables.lineitem(spark, sf)
    val p = Tables.part(spark, sf).select($"p_partkey", $"p_name")
    val plain = li.join(p, $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_linenumber", $"p_name")
    val liKeyed = li.withColumnRenamed("l_partkey", "p_partkey")
    val salted = SkewJoin.saltedJoin(liKeyed, p, "p_partkey",
        factUniqueCol = "l_orderkey", n = 8)
      .select($"l_orderkey", $"l_linenumber", $"p_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
