package graft

import org.apache.spark.sql.functions._

/** Isolated probe for the d11/d11b planes-scaling rule (VERDICT r14 #1):
  * at a given SF dir, runs d11b fixed at the oracled planes=8 vs the
  * corpus-derived [[graft.operators.Dedup.scaledPlanes]] value, and
  * reports wall (3 reps each), verified pair counts, and the
  * dropped-bucket mass at both settings — the evidence that the wired
  * rule holds fill constant where the fixed setting cap-drops a growing
  * corpus fraction. Run: `runMain graft.PlanesProbe /tmp/graftdata/sf10`.
  */
object PlanesProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf10")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = Tables.embeddings(spark, dir).count()
    val auto = operators.Dedup.scaledPlanes(n)
    println(s"[planesprobe] n=$n fixed=8 auto=$auto")
    for (p <- Seq(8, auto).distinct) {
      val d = operators.Dedup
        .semanticDroppedBuckets(spark, dir, planes = p)
        .agg(count(lit(1)).as("nb"),
          coalesce(sum($"bucket_n"), lit(0L)).as("nv")).head()
      println(s"[planesprobe] planes=$p droppedBuckets=${d.getLong(0)} " +
        s"droppedVecs=${d.getLong(1)}")
      spark.catalog.clearCache()
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val pairs = operators.Dedup
          .semanticDedupMultiprobe(spark, dir, planes = p).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[planesprobe] d11b planes=$p rep=$rep pairs=$pairs " +
          f"wall=$sec%.2f s")
        spark.catalog.clearCache()
      }
    }
    // End-state leg: the giant clusters no plane count splits are the
    // canonical-routing regime — d12 with oversizedCanonical covers
    // them at O(bucket) cost where the pair list would need O(bucket²)
    // verifies. Report wall + the coverage the pair form drops.
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val cl = operators.Dedup.semanticClusters(spark, dir,
        oversizedCanonical = true)
      val agg = cl.agg(count(lit(1)).as("n"),
        sum(when(!$"is_kept", 1L).otherwise(0L)).as("pruned")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[planesprobe] d12 canonical rep=$rep n=${agg.getLong(0)} " +
        f"pruned=${agg.getLong(1)} wall=$sec%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
