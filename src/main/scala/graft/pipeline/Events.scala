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
      |FROM __events__ events
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
      |  FROM __events__ events
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
      |FROM __events__ events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** As-of join by composition (Spark lacks a native one): for each left
    * event, the greatest right-side ts ≤ left ts within the same key.
    *
    * Implementation is the union+window trick — one shuffle on the key,
    * one ordered pass: tag both sides, sort by (ts, side) with right
    * first on ties, carry the last seen right ts forward. This beats a
    * range self-join (no O(n·m) per key) and is the standard scalable
    * as-of shape; a custom LogicalPlan+Strategy would only change the
    * API, not the data movement.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: String): DataFrame = {
    val l = left.select(col(key), col(ts), col(payload))
      .withColumn("_side", lit(1))
      .withColumn("_right_us", lit(null).cast("long"))
    val r = right.select(col(key), col(ts))
      .withColumn(payload, lit(null).cast(left.schema(payload).dataType))
      .withColumn("_side", lit(0))
      .withColumn("_right_us", unix_micros(col(ts)))
    // Right rows sort before left on equal ts (_side 0 < 1) so a right
    // row at exactly left.ts is matched — ASOF `p.ts >= v.ts` semantics.
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("_asof_us", last(col("_right_us"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col(key), col(ts), col(payload),
        timestamp_micros(col("_asof_us")).as("asof_ts"))
  }

  /** e04: as-of join — each purchase matched to the user's most recent
    * view at-or-before it (DuckDB's native ASOF JOIN is the oracle).
    */
  def asof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts")
    asofJoin(purchases, views, "user_id", "ts", "event_id")
      .select($"user_id", $"event_id", $"ts", $"asof_ts",
        (unix_micros($"ts") - unix_micros($"asof_ts")).as("lag_us"))
      .orderBy($"user_id", $"event_id")
  }

  val asofSql: String =
    """WITH purchases AS (
      |  SELECT user_id, ts::TIMESTAMP AS ts, event_id FROM __events__ events
      |  WHERE event_type = 'purchase'),
      |views AS (
      |  SELECT user_id, ts::TIMESTAMP AS ts FROM __events__ events
      |  WHERE event_type = 'view')
      |SELECT p.user_id, p.event_id, p.ts, v.ts AS asof_ts,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
      |FROM purchases p
      |ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.user_id, p.event_id""".stripMargin

  /** e05: calendar gap-fill — daily event counts over the full date range
    * including empty days (generate the calendar from the data bounds,
    * left-join the daily rollup, zero-fill). The time-series resample
    * primitive; the calendar side is tiny and broadcast.
    */
  def dailyGapfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val daily = ev.groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
    val cal = ev.agg(min(to_date($"ts")).as("d0"), max(to_date($"ts")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    broadcast(cal).join(daily, Seq("day"), "left")
      .select($"day",
        coalesce($"n", lit(0L)).as("n"),
        coalesce($"total_value", lit(0.0)).as("total_value"))
      .orderBy($"day")
  }

  val dailyGapfillSql: String =
    """WITH daily AS (
      |  SELECT (ts::TIMESTAMP)::DATE AS day, count(*) AS n,
      |    round(sum(value), 2) AS total_value
      |  FROM __events__ events GROUP BY 1),
      |cal AS (
      |  SELECT unnest(generate_series(
      |    (SELECT min((ts::TIMESTAMP)::DATE) FROM __events__ events),
      |    (SELECT max((ts::TIMESTAMP)::DATE) FROM __events__ events),
      |    INTERVAL 1 DAY))::DATE AS day)
      |SELECT cal.day AS day, coalesce(daily.n, 0) AS n,
      |  coalesce(daily.total_value, 0.0) AS total_value
      |FROM cal LEFT JOIN daily ON cal.day = daily.day
      |ORDER BY cal.day""".stripMargin

  /** e06: per-type distribution statistics — variance/stddev via the
    * numerically-stable moment aggregates (single partial-agg pass; the
    * monitoring rollup every event pipeline maintains).
    */
  def typeStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(avg($"value") + lit(1e-9), 4).as("mean_value"),
        round(var_samp($"value"), 4).as("var_value"),
        round(stddev_samp($"value"), 4).as("sd_value"),
        round(min($"value"), 2).as("min_value"),
        round(max($"value"), 2).as("max_value"))
      .orderBy($"event_type")
  }

  val typeStatsSql: String =
    """SELECT event_type, count(*) AS n,
      |  round(avg(value) + 1e-9, 4) AS mean_value,
      |  round(var_samp(value), 4) AS var_value,
      |  round(stddev_samp(value), 4) AS sd_value,
      |  round(min(value), 2) AS min_value,
      |  round(max(value), 2) AS max_value
      |FROM __events__ events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** e10: sliding-window aggregation (2-hour windows every hour) — the
    * batch form of the streaming sliding window; each event contributes
    * to len/slide = 2 overlapping windows. Spark's `window()` expands
    * membership MAP-SIDE (len/slide rows per event) into one partial-agg
    * shuffle — no self-join, no range join, no calendar table.
    */
  def slidingWindowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "2 hours", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
      .orderBy($"window_start", $"event_type")
  }

  // Epoch-aligned 2h/1h windows: an event at ts belongs to the windows
  // starting at trunc(ts, hour) and trunc(ts, hour) - 1h.
  val slidingWindowAggSql: String =
    """WITH e AS (
      |  SELECT event_type, value,
      |    unnest([date_trunc('hour', ts::TIMESTAMP),
      |            date_trunc('hour', ts::TIMESTAMP) - INTERVAL 1 HOUR])
      |      AS window_start
      |  FROM __events__ events)
      |SELECT window_start, event_type, count(*) AS n,
      |  round(sum(value), 2) AS total_value
      |FROM e
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** e11: recency-weighted (exponential-decay) activity stats per event
    * type — the monitoring statistic that tracks "current" behavior
    * without a window cutoff: weight = exp(-age/τ) relative to the
    * corpus max timestamp, τ = 24 h. The reference point is a scalar
    * aggregate cross-joined in (q26's pattern — never an unpartitioned
    * window); the weighting is map-side arithmetic into one partial-agg
    * shuffle.
    */
  def ewmaTypeStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val tmax = ev.agg(max($"ts").as("t_max"))
    val tauSec = 86400.0
    ev.crossJoin(tmax)
      .withColumn("wt",
        exp(-(unix_micros($"t_max") - unix_micros($"ts")) / lit(tauSec * 1e6)))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum($"wt") + lit(1e-9), 6).as("effective_n"),
        round(sum($"wt" * $"value") / sum($"wt") + lit(1e-9), 6)
          .as("ewma_value"))
      .orderBy($"event_type")
  }

  val ewmaTypeStatsSql: String =
    """WITH t AS (SELECT max(ts::TIMESTAMP) AS t_max FROM __events__ events),
      |w AS (
      |  SELECT event_type, value,
      |    exp(-epoch_us(t_max - ts::TIMESTAMP) / (86400.0 * 1e6)) AS wt
      |  FROM __events__ events CROSS JOIN t)
      |SELECT event_type, count(*) AS n,
      |  round(sum(wt) + 1e-9, 6) AS effective_n,
      |  round(sum(wt * value) / sum(wt) + 1e-9, 6) AS ewma_value
      |FROM w
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** e12: robust outlier detection per event type via median/MAD — the
    * distribution-shape-safe complement of q26's mean/stddev z-score (one
    * heavy-tailed burst drags a mean far enough to hide real outliers;
    * the median and the median absolute deviation don't move). Flags
    * events where the modified z-score 0.6745·(v − med)/MAD exceeds 3.5
    * (the Iglewicz–Hoban cut).
    *
    * Scale shape: exactly the q26 pattern twice — each per-type statistic
    * is a |types|-row exact-percentile AGGREGATE broadcast back onto the
    * stream, never a window partitioned by the low-cardinality type key.
    * Two aggregate passes are inherent (MAD needs the median first); at
    * 100 TB both swap to percentile_approx with the same plan shape.
    * Zero-MAD groups (>50% identical values) are excluded rather than
    * dividing by zero.
    */
  def madOutliers(s: SparkSession, dir: String, cut: Double = 3.5): DataFrame =
    madOutliersOf(Tables.events(s, dir), cut)

  /** Core of [[madOutliers]] over any (event_id, event_type, value) frame. */
  def madOutliersOf(ev: DataFrame, cut: Double): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("d", $"value" - $"med")
    val mad = dev.groupBy($"event_type")
      .agg(expr("percentile(abs(d), 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .withColumn("robust_z", round(lit(0.6745) * $"d" / $"mad" + lit(1e-9), 4))
      .filter($"mad" > 0 && abs($"robust_z") > cut)
      .select($"event_id", $"event_type", $"value", $"robust_z")
      .orderBy($"event_id")
  }

  val madOutliersSql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM __events__ events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_id, e.event_type, e.value, e.value - m.med AS d
      |  FROM (FROM __events__ events WHERE ts IS NOT NULL) e JOIN med m USING (event_type)),
      |madt AS (
      |  SELECT event_type, quantile_cont(abs(d), 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT event_id, event_type, value,
      |  round(0.6745 * d / mad + 1e-9, 4) AS robust_z
      |FROM dev JOIN madt USING (event_type)
      |WHERE mad > 0 AND abs(round(0.6745 * d / mad + 1e-9, 4)) > 3.5
      |ORDER BY event_id""".stripMargin

  /** e13: calendar-seasonal anomaly detection — per event type, the
    * hour-of-day activity profile (24 gap-filled volume bins) with each
    * hour's deviation from the type's own profile in sample standard
    * deviations, flagged past `cut`. The calendar-baseline complement of
    * e11's recency-weighted level and e12's per-event value outliers: it
    * catches VOLUME anomalies ("type X dies every day at 03:00") that
    * per-event statistics can't see, the monitoring primitive behind
    * every traffic-seasonality alert.
    *
    * Scale shape: one partial-aggregatable count over the full stream
    * collapses to <= |types|·24 rows; the hour template (e05's gapfill
    * idiom — an absent hour is a zero-volume bin, the most anomalous
    * value, not a missing row) and the per-type mean/std profile are
    * joins among those tiny frames, with the aggregated side broadcast.
    * No window over a low-cardinality key anywhere (the q26 rule), and
    * nothing downstream of the first aggregate ever touches full data.
    * Flat-profile types (sd = 0) report z = 0 rather than dividing by
    * zero. The flag compares the ROUNDED z in both engines.
    */
  def seasonalBaseline(s: SparkSession, dir: String,
      cut: Double = 2.0): DataFrame =
    seasonalBaselineOf(Tables.events(s, dir), cut)

  /** Core of [[seasonalBaseline]] over any (event_type, ts) frame. */
  def seasonalBaselineOf(ev: DataFrame, cut: Double = 2.0): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val counts = ev.groupBy($"event_type", hour($"ts").as("hr"))
      .agg(count(lit(1)).as("n"))
    val template = ev.select($"event_type").distinct()
      .crossJoin(s.range(0, 24).select($"id".cast("int").as("hr")))
    val filled = template.join(broadcast(counts), Seq("event_type", "hr"), "left")
      .withColumn("n", coalesce($"n", lit(0L)))
    val prof = filled.groupBy($"event_type")
      .agg(avg($"n").as("mu"), stddev_samp($"n").as("sd"))
    val z = when($"sd" > 0,
      round(($"n" - $"mu") / $"sd" + lit(1e-9), 4)).otherwise(lit(0.0))
    filled.join(broadcast(prof), Seq("event_type"))
      .select($"event_type", $"hr", $"n",
        round($"mu" + lit(1e-9), 4).as("mu_hour"),
        z.as("z"),
        (abs(z) > cut).as("is_anomaly"))
      .orderBy($"event_type", $"hr")
  }

  val seasonalBaselineSql: String =
    """WITH c AS (
      |  SELECT event_type, hour(ts::TIMESTAMP) AS hr, count(*) AS n
      |  FROM __events__ events GROUP BY 1, 2),
      |tmpl AS (
      |  SELECT event_type, unnest(range(0, 24)) AS hr
      |  FROM (SELECT DISTINCT event_type FROM __events__ events)),
      |f AS (
      |  SELECT t.event_type, t.hr, coalesce(c.n, 0) AS n
      |  FROM tmpl t LEFT JOIN c ON t.event_type = c.event_type AND t.hr = c.hr),
      |p AS (
      |  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd
      |  FROM f GROUP BY 1)
      |SELECT f.event_type, f.hr, f.n,
      |  round(p.mu + 1e-9, 4) AS mu_hour,
      |  CASE WHEN p.sd > 0 THEN round((f.n - p.mu) / p.sd + 1e-9, 4)
      |    ELSE 0.0 END AS z,
      |  CASE WHEN p.sd > 0
      |    THEN abs(round((f.n - p.mu) / p.sd + 1e-9, 4)) > 2.0
      |    ELSE FALSE END AS is_anomaly
      |FROM f JOIN p USING (event_type)
      |ORDER BY f.event_type, f.hr""".stripMargin

  /** e14: CUSUM changepoint detection on per-type daily volumes — the
    * sequential drift detector that complements e13's static calendar
    * profile: e13 flags "this hour deviates from ITS OWN profile", CUSUM
    * flags "the level has SHIFTED and stayed shifted" (a feed dying, a
    * source doubling) by accumulating small same-signed deviations that
    * no single-point z-test reaches. Standard one-sided pair with
    * reference drift `k` and decision threshold `h` (Page 1954 shape).
    *
    * The max(0, S+x) recursion is not a windowed sum — but it has a
    * closed form over prefix sums: S⁺_t = C_t − min(0, min_{j≤t} C_j)
    * with C = Σ(z−k), and symmetrically S⁻_t = max(0, max_{j≤t} D_j) −
    * D_t with D = Σ(z+k) — so the whole detector is two ordered window
    * passes over the ALREADY-AGGREGATED per-(type, day) frame
    * (|types|·days rows; the only full-data work is the partial-agg
    * daily count — the q26 rule: aggregate first, window the tiny
    * frame). Threshold compares on un-rounded IEEE values in both
    * engines (the t22 idiom); sd=0 profiles pin z to 0.
    */
  def cusumChangepoint(s: SparkSession, dir: String, k: Double = 0.5,
      h: Double = 4.0): DataFrame =
    cusumChangepointOf(Tables.events(s, dir), k, h)

  /** Core of [[cusumChangepoint]] over any (event_type, ts) frame. */
  def cusumChangepointOf(ev: DataFrame, k: Double = 0.5,
      h: Double = 4.0): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val daily = ev.groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val prof = daily.groupBy($"event_type")
      .agg(avg($"n").as("mu"), stddev_samp($"n").as("sd"))
    val z = when($"sd" > 0, ($"n" - $"mu") / $"sd").otherwise(lit(0.0))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c1 = daily.join(broadcast(prof), Seq("event_type"))
      .select($"event_type", $"day", $"n",
        sum(z - lit(k)).over(w).as("cum"),
        sum(z + lit(k)).over(w).as("dcum"))
    c1.select($"event_type", $"day", $"n",
        ($"cum" - least(min($"cum").over(w), lit(0.0))).as("s_pos_raw"),
        (greatest(max($"dcum").over(w), lit(0.0)) - $"dcum").as("s_neg_raw"))
      .select($"event_type", $"day", $"n",
        round($"s_pos_raw" + lit(1e-9), 4).as("s_pos"),
        round($"s_neg_raw" + lit(1e-9), 4).as("s_neg"),
        ($"s_pos_raw" > h || $"s_neg_raw" > h).as("is_change"))
      .orderBy($"event_type", $"day")
  }

  val cusumChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM __events__ events GROUP BY 1, 2),
      |prof AS (
      |  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd
      |  FROM daily GROUP BY 1),
      |sc AS (
      |  SELECT d.event_type, d.day, d.n,
      |    CASE WHEN p.sd > 0 THEN (d.n - p.mu) / p.sd ELSE 0.0 END AS z
      |  FROM daily d JOIN prof p USING (event_type)),
      |c1 AS (
      |  SELECT event_type, day, n,
      |    sum(z - 0.5) OVER w AS cum, sum(z + 0.5) OVER w AS dcum
      |  FROM sc
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |c2 AS (
      |  SELECT event_type, day, n,
      |    cum - least(min(cum) OVER w, 0.0) AS s_pos_raw,
      |    greatest(max(dcum) OVER w, 0.0) - dcum AS s_neg_raw
      |  FROM c1
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, day, n,
      |  round(s_pos_raw + 1e-9, 4) AS s_pos,
      |  round(s_neg_raw + 1e-9, 4) AS s_neg,
      |  (s_pos_raw > 4.0 OR s_neg_raw > 4.0) AS is_change
      |FROM c2
      |ORDER BY event_type, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e14_cusum_changepoint" ->
      ((s: SparkSession, d: String) => cusumChangepoint(s, d)),
    "e13_seasonal_baseline" -> ((s: SparkSession, d: String) => seasonalBaseline(s, d)),
    "e12_mad_outliers" -> ((s: SparkSession, d: String) => madOutliers(s, d)),
    "e11_ewma_stats" -> ewmaTypeStats _,
    "e10_sliding_window" -> slidingWindowAgg _,
    "e06_type_stats" -> typeStats _,
    "e05_daily_gapfill" -> dailyGapfill _,
    "e01_window_agg" -> windowAgg _,
    "e02_sessionize" -> sessionize _,
    "e03_running_total" -> runningTotal _,
    "e04_asof_join" -> asof _)

  /** The events LOAD CONTRACT (Tables.events: NULL-ts rows dead-lettered,
    * non-finite values nulled) as the DuckDB inline view every events
    * oracle reads through. Oracle SQL strings write the `__events__`
    * token and [[withEventsView]] expands it ONCE — a raw `events`
    * reference bypassing the contract is exactly how q24's oracle
    * silently diverged (caught by review), and a token that expands
    * centrally cannot be missed at one site.
    */
  val EventsView: String =
    "(SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END AS value) " +
      "FROM events WHERE ts IS NOT NULL)"

  private[pipeline] def withEventsView(m: Map[String, String]): Map[String, String] =
    m.map { case (k, v) => k -> v.replace("__events__", EventsView) }

  val oracles: Map[String, String] = withEventsView(Map(
    "e14_cusum_changepoint" -> cusumChangepointSql,
    "e13_seasonal_baseline" -> seasonalBaselineSql,
    "e12_mad_outliers" -> madOutliersSql,
    "e11_ewma_stats" -> ewmaTypeStatsSql,
    "e10_sliding_window" -> slidingWindowAggSql,
    "e06_type_stats" -> typeStatsSql,
    "e05_daily_gapfill" -> dailyGapfillSql,
    "e01_window_agg" -> windowAggSql,
    "e02_sessionize" -> sessionizeSql,
    "e03_running_total" -> runningTotalSql,
    "e04_asof_join" -> asofSql))
}
