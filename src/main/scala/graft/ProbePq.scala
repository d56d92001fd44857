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
      if (sys.env.contains("PQ_SEARCH_STAGES")) {
        // Replicate adcTopK's internals (private there) to attribute the
        // search wall: probe routing, ADC scoring+shortlist, exact re-rank.
        import org.apache.spark.sql.expressions.Window
        import graft.functions.VectorFunctions._
        val emb2 = Tables.embeddings(spark, dir)
        val coarse2 = graft.operators.IvfIndex.train(emb2, 16, 2)
          .zipWithIndex.map { case ((_, c), i) => (i, c) }
        val assigned2 = graft.operators.IvfIndex.assign(emb2, coarse2)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val centLit = typedlit(coarse2.map(_._2))
        val resid2 = assigned2.select($"vec_id",
          zip_with($"v", element_at(centLit, $"cluster_id" + 1),
            (a, b) => a - b).as("embedding"), $"cluster_id")
        val books2 = graft.operators.PqIndex.train(resid2, 8, 256, 2)
        val indexed2 = graft.operators.PqIndex.encode(resid2, books2)
          .join(assigned2.select($"vec_id", $"cluster_id"), "vec_id")
        val queries2 = emb2.filter($"vec_id" < 32)
          .select($"vec_id".as("query_id"), asDouble($"embedding").as("qv"))
        val cDf = spark.createDataFrame(coarse2).toDF("cluster_id", "centroid")
        val wProbe = Window.partitionBy($"query_id")
          .orderBy($"csim".desc, $"cluster_id")
        val probes2 = queries2.crossJoin(broadcast(cDf))
          .withColumn("csim", cosine($"qv", $"centroid"))
          .withColumn("prn", org.apache.spark.sql.functions.row_number().over(wProbe))
          .filter($"prn" <= 4)
          .select($"query_id", $"qv", $"cluster_id")
        t("search: probes") {
          probes2.write.format("noop").mode("overwrite").save()
        }
        val members2 = indexed2.select($"cluster_id",
          $"vec_id".as("neighbor_id"), $"code")
        val d2 = books2.head.head._2.size
        def cSub(sub: Int) =
          slice(element_at(centLit, $"cluster_id" + 1), sub * d2 + 1, d2)
        def rSub(sub: Int) =
          element_at(typedlit(books2(sub).map(_._2)),
            element_at($"code", sub + 1) + 1)
        val adcDot = books2.indices.map { sub =>
          dot(slice($"qv", sub * d2 + 1, d2), cSub(sub)) +
            dot(slice($"qv", sub * d2 + 1, d2), rSub(sub))
        }.reduce(_ + _)
        val recNormSq = books2.indices.map { sub =>
          dot(cSub(sub), cSub(sub)) +
            lit(2.0) * dot(cSub(sub), rSub(sub)) +
            dot(rSub(sub), rSub(sub))
        }.reduce(_ + _)
        val joined2 = broadcast(probes2).join(members2, Seq("cluster_id"))
          .filter($"query_id" =!= $"neighbor_id")
        t("search: join only") {
          joined2.select($"query_id", $"neighbor_id")
            .write.format("noop").mode("overwrite").save()
        }
        val adcScored = joined2
          .withColumn("adc", adcDot / (sqrt(normSq($"qv")) * sqrt(recNormSq)))
        t("search: join+adc score") {
          adcScored.select($"query_id", $"neighbor_id", $"adc")
            .write.format("noop").mode("overwrite").save()
        }
        val wAdc = Window.partitionBy($"query_id")
          .orderBy($"adc".desc, $"neighbor_id")
        val cand2 = adcScored
          .withColumn("arn", org.apache.spark.sql.functions.row_number().over(wAdc))
          .filter($"arn" <= 2048)
          .select($"query_id", $"qv", $"neighbor_id")
        t("search: +shortlist window") {
          cand2.write.format("noop").mode("overwrite").save()
        }
        assigned2.unpersist()
      }
      if (rep == reps && sys.env.contains("PQ_EXPLAIN")) {
        // SimpleMode shows WholeStageCodegen spans as *(n) — the check is
        // whether the ADC projection runs codegen'd or interpreted.
        val plan = graft.operators.PqIndex.knnPq(spark, dir)
          .queryExecution.executedPlan.toString
        println(plan.linesIterator.filter(l =>
          l.contains("Project") || l.contains("Window") ||
            l.contains("Join") || l.contains("Sort") ||
            l.contains("Exchange")).take(40).mkString("\n"))
      }
      spark.catalog.clearCache()
      CacheHygiene.freeTransient(spark)
    }
    spark.stop()
  }
}
