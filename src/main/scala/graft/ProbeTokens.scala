package graft

import org.apache.spark.sql.functions._

/** Isolated A/B of the r15 allocate-to-count rewrites at scale: the
  * codegen'd WsTokenCount / BpeishTokenCount byte scans vs the
  * `size(split(text, "\s+"))` / `size(regexp_extract_all(...))` forms
  * they replaced (TokenCountSpec pins bit-equality; this measures the
  * wall). Run: `runMain graft.ProbeTokens /tmp/graftdata/sf10`.
  */
object ProbeTokens {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf10")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probetok] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  sum=$n")
    }

    val docs = Tables.documents(spark, dir).select($"text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probetok] docs=${docs.count()}")

    for (rep <- 1 to 3) {
      timed(s"ws byte scan     $rep") {
        docs.select(sum(org.apache.spark.sql.graft.GraftFunctions
          .ws_token_count($"text"))).collect()(0).getLong(0)
      }
      timed(s"ws size(split)   $rep") {
        docs.select(sum(size(split($"text", "\\s+"))))
          .collect()(0).getLong(0)
      }
      timed(s"bpe byte scan    $rep") {
        docs.select(sum(org.apache.spark.sql.graft.GraftFunctions
          .bpeish_token_count($"text"))).collect()(0).getLong(0)
      }
      timed(s"bpe regex extract $rep") {
        docs.select(sum(size(regexp_extract_all($"text",
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))))
          .collect()(0).getLong(0)
      }
    }
    spark.stop()
  }
}
