package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §5).
  *
  * AQE's skew-join handles most cases at runtime; explicit salting remains
  * the tool when one key dominates so badly that even split partitions
  * overwhelm a task, or when the small side must be replicated anyway.
  * The fact side gets a deterministic salt derived from a unique column;
  * the dim side is replicated `n` ways so every (key, salt) bucket joins
  * locally. Result is row-identical to the unsalted join.
  */
object SkewJoin {

  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
      factUniqueCol: String, n: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(n > 0)
    val salted = facts.withColumn("_salt",
      pmod(xxhash64(col(factUniqueCol)), lit(n.toLong)))
    val replicated = dims.withColumn("_salt",
      explode(sequence(lit(0L), lit(n.toLong - 1L))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
