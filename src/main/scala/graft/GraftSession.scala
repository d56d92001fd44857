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
      // Plan strings are diagnostics; the ~2 GB default means a deep
      // composed DAG (p07: ~10 chained stages whose anti-join sides each
      // re-render the parent's InMemoryRelation innerChildren) can spend
      // MINUTES of driver CPU string-building before the first job. Cap
      // it — SizeLimitedWriter aborts the tree walk at the limit.
      .config("spark.sql.maxPlanStringLength", "100000")
      .config("spark.ui.enabled", "false")

  /** A/B knobs (guide §3.1/§9, §2.2/§6): shuffled-hash-join preference and
    * a scan-parallelism floor. Env-parameterized so the bench can measure
    * both arms without a rebuild; when unset, Spark defaults hold (see
    * OPTIMIZATION_r18.md for the measured outcome).
    */
  private def abKnobs(b: SparkSession.Builder): SparkSession.Builder = {
    val withSmj = sys.env.get("SPARK_GRAFT_PREFER_SMJ").fold(b)(v =>
      b.config("spark.sql.join.preferSortMergeJoin", v))
    sys.env.get("SPARK_GRAFT_MIN_SCAN_PARTS").fold(withSmj)(v =>
      withSmj.config("spark.sql.files.minPartitionNum", v))
  }

  /** Session for local work with `cpus` cores; registers the graft SQL
    * functions so `graft_*` is available out of the box.
    */
  def local(cpus: Int): SparkSession = {
    val s = abKnobs(builder(s"local[$cpus]", cpus)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftExtensions.register(s)
    s
  }
}
