package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory — every graft entry point (Verify, Bench,
  * Plans, tests, user code) needs the same base configuration:
  * UTC timestamps (oracle parity), ANSI off (try-parse fallback chains),
  * nanos-as-long (TIMESTAMP(NANOS) parquet), AQE on, shuffle partitions
  * sized to the machine rather than the 200 default.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Session for local work with `cpus` cores; registers the graft SQL
    * functions so `graft_*` is available out of the box.
    */
  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftExtensions.register(s)
    s
  }
}
