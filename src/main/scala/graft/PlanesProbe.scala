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
    spark.stop()
  }
}
