package graft

/** Direct evidence for the r17 regression attribution (VERDICT r17 #1):
  * runs a consume-once-checkpoint query back-to-back `reps` times the
  * way Bench does (catalog clearCache between reps, NO checkpoint
  * freeing), printing the block-manager-resident RDD storage after each
  * rep — the generations stack because the ContextCleaner frees
  * checkpoint blocks only when a driver GC happens to run — then frees
  * transients via CacheHygiene and prints the footprint again.
  *
  * Usage: runMain graft.ResidueProbe [query] [reps] (env SPARK_GRAFT_SF_DIR)
  */
object ResidueProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val query = if (args.length > 0) args(0) else "d11b_semantic_multiprobe"
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def resident(): (Int, Long, Long) = {
      val info = spark.sparkContext.getRDDStorageInfo
      (info.length, info.map(_.memSize).sum, info.map(_.diskSize).sum)
    }
    val fn = SparkEntry.queries(query)
    val perRep = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val (n, mem, disk) = resident()
      f"""{"rep":$i,"sec":$sec%.2f,"resident_rdds":$n,"mem_mb":${mem / 1e6}%.1f,"disk_mb":${disk / 1e6}%.1f}"""
    }
    val freed = CacheHygiene.freeTransient(spark)
    val (n, mem, disk) = resident()
    println(s"""{"probe":"checkpoint_residue","query":"$query","sf":"$sfDir","reps":[${perRep.mkString(",")}],""" +
      f""""freed_rdds":$freed,"after_free_rdds":$n,"after_free_mem_mb":${mem / 1e6}%.1f,"after_free_disk_mb":${disk / 1e6}%.1f}""")
    spark.stop()
  }
}
