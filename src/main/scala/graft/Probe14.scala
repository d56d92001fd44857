package graft

import org.apache.spark.sql.SparkSession

/** Scratch round-14 probe (deleted before round end): the input-scaled
  * shuffle-partition heuristic (219 at sf10) regressed the narrow
  * sort/window tail (p05 10.5->44 s, q29 3.7->29 s, d10 14->66 s) while
  * the heavy shuffles it was meant to help were fixed by code changes.
  * Probe A showed the damage is ~0.35 s of fixed cost per tiny task.
  * Hypothesis: AQE's default parallelismFirst=true refuses to coalesce
  * small exchanges below the parallelism floor, so every narrow shuffle
  * runs 219 near-empty tasks. Test: same 219 partitions with
  * size-first coalescing (parallelismFirst=false, advisory 64 MB).
  */
object Probe14 {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = if (args.nonEmpty) args(0) else "/tmp/graftdata/sf10"
    val spark: SparkSession = GraftSession.local(32)
    // Leg C: the r13 setting (partitions = cores, default AQE) with the
    // r14 code — if the heavy hitters hold their r14 numbers here, the
    // input-scaled heuristic carried no benefit its code changes didn't.
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val sec = (for {c <- si.completionTime; s <- si.submissionTime}
            yield (c - s) / 1e3).getOrElse(-1.0)
          if (sec > 0.5)
            stages.add(f"    stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"$sec%7.2f s  ${si.name.takeWhile(_ != '\n').take(60)}")
        }
      })
    def time(label: String, f: => Unit): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      f
      org.apache.spark.sql.graft.SparkInternals
        .drainListenerBus(spark.sparkContext)
      println(f"[probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      stages.forEach(println(_))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(name: String): Unit = {
      time(name, noop(SparkEntry.queries(name)(spark, dir)))
      spark.catalog.clearCache()
    }
    // warm
    noop(SparkEntry.queries("q01_pricing_agg")(spark, dir))
    spark.catalog.clearCache()
    // The regressed narrow tail (r14 sf10 medians at 219/parallelismFirst:
    // p05 44.3, q29 29.0, d10 66.0, q31 14.7, q36 14.7, q38 9.0;
    // r13 at 32 parts: 10.5 / 3.7 / 14.4 / 2.5 / 3.5 / 2.0).
    Seq("p05_importance_resample", "q29_scd2_intervals", "d10_hot_ngram_mask",
      "q31_percent_rank", "q36_cdc_merge", "q38_grouping_sets",
      "d11b_semantic_multiprobe", "d19_substring_dedup",
      "g02_copurchase", "g02b_copurchase_sketch", "g03_triangles",
      "d18b_segment_neardup_full").foreach(run)
    spark.stop()
  }
}
