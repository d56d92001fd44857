package graft
/** Scratch driver for local iteration — not part of the library surface. */
object Adhoc {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = GraftSession.local(8)
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[adhoc] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val docs = Tables.documents(spark, dir).filter(col("doc_id") >= 5)
    time("d18b on parquet") {
      operators.Dedup.segmentNeardupFullOf(docs.select("doc_id","text")).write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    val ckpt = docs.select("doc_id","source","text").localCheckpoint()
    time("d18b on localCheckpoint") {
      operators.Dedup.segmentNeardupFullOf(ckpt.select("doc_id","text")).write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    time("d18b on ckpt again") {
      operators.Dedup.segmentNeardupFullOf(ckpt.select("doc_id","text")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
