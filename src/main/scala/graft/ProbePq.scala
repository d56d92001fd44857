package graft

import org.apache.spark.sql.functions._

/** Stage-level timing for s06 (IVF-PQ): where do the seconds go —
  * coarse Lloyd, assignment+residuals, PQ joint Lloyd, encode, or the
  * ADC search? Each stage is materialized with the noop sink (guide
  * §1.4) so the timing isolates that stage's computation.
  *
  * Usage: tools/jrun.sh graft.ProbePq <sfDir> [reps]
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pq] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"[pq] --- rep $rep ---")
      val emb = Tables.embeddings(spark, dir)
      val coarse = t("coarse train (2 iters)") {
        graft.operators.IvfIndex.train(emb, 16, 2)
          .zipWithIndex.map { case ((_, c), i) => (i, c) }
      }
      val assigned = t("assign (materialize)") {
        val a = graft.operators.IvfIndex.assign(emb, coarse)
        a.write.format("noop").mode("overwrite").save(); a
      }
      // residuals replicated from PqIndex (private there)
      val centLit = typedlit(coarse.map(_._2))
      val resid = assigned.select($"vec_id",
        zip_with($"v", element_at(centLit, $"cluster_id" + 1),
          (a, b) => a - b).as("embedding"), $"cluster_id")
      t("resid (materialize)") {
        resid.write.format("noop").mode("overwrite").save()
      }
      val books = t("pq train (2 iters)") {
        graft.operators.PqIndex.train(resid, 8, 256, 2)
      }
      t("encode (materialize)") {
        graft.operators.PqIndex.encode(resid, books)
          .write.format("noop").mode("overwrite").save()
      }
      t("full s06 query") {
        graft.operators.PqIndex.knnPq(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      CacheHygiene.freeTransient(spark)
    }
    spark.stop()
  }
}
