package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream operators, batch form (SURVEY.md §2 e01–e03). The
  * Structured Streaming variants live in graft.streaming and are verified
  * in ScalaTest; these batch forms share the same windowing semantics and
  * feed the DuckDB oracle gate.
  *
  * Scale notes: e01 is partial-agg + one shuffle on (window, type); e02/e03
  * shuffle once on user_id and then run ordered window functions within
  * partitions — the standard scalable sessionization shape (no driver-side
  * state, no O(n²)).
  */
object Events {

  /** e01: tumbling-window aggregation per event type. */
  def windowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum($"value"), 2).as("total_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"hour", $"event_type")
  }

  val windowAggSql: String =
    """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour, event_type,
      |  count(*) AS n, round(sum(value), 2) AS total_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  /** e02: gap-based sessionization (30-minute inactivity gap): lag →
    * new-session flag → running count = session id → per-session rollup.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        ($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L).cast("int"))
      .withColumn("session_id",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"))
      .orderBy($"user_id", $"session_id")
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
      |    CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
      |           OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** e03: per-user ordered running total (incremental-metrics shape). */
  def runningTotal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"ts",
        round(sum($"value").over(byUser), 2).as("running_value"),
        count(lit(1)).over(byUser).as("running_n"))
      .orderBy($"user_id", $"event_id")
  }

  val runningTotalSql: String =
    """SELECT user_id, event_id, ts::TIMESTAMP AS ts,
      |  round(sum(value) OVER w, 2) AS running_value,
      |  count(*) OVER w AS running_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_window_agg" -> windowAgg _,
    "e02_sessionize" -> sessionize _,
    "e03_running_total" -> runningTotal _)

  val oracles: Map[String, String] = Map(
    "e01_window_agg" -> windowAggSql,
    "e02_sessionize" -> sessionizeSql,
    "e03_running_total" -> runningTotalSql)
}
