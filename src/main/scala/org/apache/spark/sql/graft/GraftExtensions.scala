package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's custom expressions.
  *
  * Use either:
  *  - `SparkSession.builder().withExtensions(new GraftExtensions)` (config
  *    `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`), or
  *  - `GraftExtensions.register(spark)` on a live session.
  *
  * Then e.g. `SELECT graft_simhash64(split(text, ' ')) FROM docs`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, (info, builder)) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  val builders: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "graft_dot_product" -> (
      (new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
        (args: Seq[Expression]) => DotProduct(args(0), args(1)))),
    "graft_minhash_sig" -> (
      (new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
        (args: Seq[Expression]) =>
          MinHashSig(args(0), if (args.size > 1) intArg(args(1), "k") else 64))),
    "graft_simhash64" -> (
      (new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
        (args: Seq[Expression]) => SimHash64(args(0)))),
    "graft_hyperplane_sig" -> (
      (new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
        (args: Seq[Expression]) => HyperplaneSig(args(0), intArg(args(1), "planes")))),
    // nprobe is REQUIRED: the Scala callers use different values (s02b 8,
    // d11b 3), so a silent SQL default would quietly under-probe.
    "graft_hyperplane_probes" -> (
      (new ExpressionInfo(classOf[HyperplaneProbes].getName, "graft_hyperplane_probes"),
        (args: Seq[Expression]) => {
          if (args.size < 3) throw new IllegalArgumentException(
            "graft_hyperplane_probes(v, planes, nprobe) requires all three arguments")
          HyperplaneProbes(args(0), intArg(args(1), "planes"),
            intArg(args(2), "nprobe"))
        })),
    "graft_word_shingles" -> (
      (new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
        (args: Seq[Expression]) =>
          WordShingles(args(0), if (args.size > 1) intArg(args(1), "n") else 3))),
    "graft_winnow_fingerprints" -> (
      (new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow_fingerprints"),
        (args: Seq[Expression]) =>
          WinnowFingerprints(args(0), if (args.size > 1) intArg(args(1), "window") else 4))),
    "graft_word_shingle_hashes" -> (
      (new ExpressionInfo(classOf[WordShingleHashes].getName, "graft_word_shingle_hashes"),
        (args: Seq[Expression]) =>
          WordShingleHashes(args(0), if (args.size > 1) intArg(args(1), "n") else 3))),
    "graft_minhash_sig_from_hashes" -> (
      (new ExpressionInfo(classOf[MinHashSigFromHashes].getName, "graft_minhash_sig_from_hashes"),
        (args: Seq[Expression]) =>
          MinHashSigFromHashes(args(0), if (args.size > 1) intArg(args(1), "k") else 64))),
    "graft_sorted_intersection_size" -> (
      (new ExpressionInfo(classOf[SortedIntersectionSize].getName, "graft_sorted_intersection_size"),
        (args: Seq[Expression]) => SortedIntersectionSize(args(0), args(1)))),
    "graft_collapse_adjacent_repeats" -> (
      (new ExpressionInfo(classOf[CollapseAdjacentRepeats].getName, "graft_collapse_adjacent_repeats"),
        (args: Seq[Expression]) => CollapseAdjacentRepeats(args(0)))))

  /** Register all graft functions into an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
