package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns using Spark higher-order
  * functions — distributed, no UDFs, no collect.
  *
  * The fold order is deliberately sequential (left fold over the array) so
  * results are bit-deterministic and reproducible against the DuckDB oracle
  * (which sums lists sequentially too); final outputs are rounded anyway.
  * Round-2 plan (SURVEY.md §7): replace the hot dot-product with a custom
  * Catalyst Expression with doGenCode to get it into whole-stage codegen.
  */
object VectorFunctions {

  /** Element-wise cast to double (exact for float32 inputs). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-sum dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity: dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))
}
