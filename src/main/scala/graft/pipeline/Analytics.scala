package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-2 analytics additions (SURVEY.md §2): multidimensional rollups,
  * statistical aggregates, ranked top-k, range joins, histograms, outlier
  * scoring, and the cohort/funnel event analytics a corpus-telemetry
  * pipeline runs.
  *
  * Scale notes: every aggregate here is partial-aggregatable (one shuffle);
  * the range join is a bucketed equi-join (operators.RangeJoin), never a
  * nested loop over the fact side; z-score stats are a 5-row broadcast, not
  * a window over a 5-partition skew.
  */
object Analytics {

  /** q21: CUBE over (source, lang) — all four grouping sets in one pass
    * (Catalyst expands to a single Expand + partial agg; the reference
    * computes each rollup level with a separate pandas pass).
    */
  def cubeRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .cube($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .select(coalesce($"source", lit("ALL")).as("source_g"),
        coalesce($"lang", lit("ALL")).as("lang_g"),
        $"n_docs", $"total_chars")
      .orderBy($"source_g", $"lang_g")
  }

  val cubeRollupSql: String =
    """SELECT coalesce(source, 'ALL') AS source_g, coalesce(lang, 'ALL') AS lang_g,
      |  count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
      |FROM documents
      |GROUP BY CUBE (source, lang)
      |ORDER BY source_g, lang_g""".stripMargin

  /** q38: explicit GROUPING SETS over an order-customer join — the
    * targeted-rollup complement of q21's CUBE: only the three report
    * levels the caller asked for ((segment, priority), (segment), ())
    * are expanded, not the 2^k lattice, and `grouping_id` disambiguates
    * a real NULL group from a rolled-up one. One Expand node feeds ONE
    * partial-aggregatable shuffle regardless of how many sets are listed
    * — the planner shape that makes multi-level reports one pass at any
    * scale.
    */
  def groupingSetsReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val j = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
    j.groupingSets(
        Seq(Seq($"c_mktsegment", $"o_orderpriority"),
          Seq($"c_mktsegment"), Seq()),
        $"c_mktsegment", $"o_orderpriority")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice") + lit(1e-9), 2).as("total_price"))
      .select(coalesce($"c_mktsegment", lit("ALL")).as("segment_g"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority_g"),
        $"gid", $"n_orders", $"total_price")
      .orderBy($"segment_g", $"priority_g", $"gid")
  }

  val groupingSetsReportSql: String =
    """SELECT coalesce(c_mktsegment, 'ALL') AS segment_g,
      |  coalesce(o_orderpriority, 'ALL') AS priority_g,
      |  GROUPING(c_mktsegment, o_orderpriority)::BIGINT AS gid,
      |  count(*) AS n_orders,
      |  round(sum(o_totalprice) + 1e-9, 2) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority),
      |  (c_mktsegment), ())
      |ORDER BY segment_g, priority_g, gid""".stripMargin

  /** q22: per-group bivariate statistics — correlation, covariance and the
    * least-squares fit of price on quantity, all numerically-stable moment
    * aggregates in a single partial-agg pass.
    */
  def corrStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(corr($"l_quantity", $"l_extendedprice") + lit(1e-9), 6).as("corr_qty_price"),
        round(covar_samp($"l_quantity", $"l_extendedprice") + lit(1e-9), 2).as("covar_qty_price"),
        round(regr_slope($"l_extendedprice", $"l_quantity") + lit(1e-9), 4).as("fit_slope"),
        round(regr_intercept($"l_extendedprice", $"l_quantity") + lit(1e-9), 2).as("fit_intercept"))
      .orderBy($"l_returnflag")
  }

  val corrStatsSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(corr(l_quantity, l_extendedprice) + 1e-9, 6) AS corr_qty_price,
      |  round(covar_samp(l_quantity, l_extendedprice) + 1e-9, 2) AS covar_qty_price,
      |  round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 4) AS fit_slope,
      |  round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 2) AS fit_intercept
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q23: top-3 parts per brand by revenue, rank kept in the output. The
    * rank ordering is made fully deterministic (revenue rounded before
    * ranking, part key as tie-break) so both engines rank identically.
    * WindowGroupLimit pushes the top-k below the shuffle.
    */
  def topkRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_partkey")
      .agg(round(sum($"l_extendedprice"), 2).as("revenue"))
    // NULLS LAST explicit: a part whose lineitems all carry NULL price
    // has unknown revenue and must never outrank a known one (both
    // engines' DESC defaults agree, but the q29 lesson says pin it).
    val w = Window.partitionBy($"p_brand")
      .orderBy($"revenue".desc_nulls_last, $"p_partkey")
    rev.withColumn("rnk", rank().over(w))
      .filter($"rnk" <= 3)
      .select($"p_brand", $"rnk", $"p_partkey", $"revenue")
      .orderBy($"p_brand", $"rnk")
  }

  val topkRankSql: String =
    """WITH rev AS (
      |  SELECT p.p_brand, l.l_partkey AS p_partkey,
      |    round(sum(l.l_extendedprice), 2) AS revenue
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2)
      |SELECT p_brand, rnk, p_partkey, revenue
      |FROM (
      |  SELECT p_brand, p_partkey, revenue, rank() OVER (
      |    PARTITION BY p_brand ORDER BY revenue DESC NULLS LAST, p_partkey) AS rnk
      |  FROM rev)
      |WHERE rnk <= 3
      |ORDER BY p_brand, rnk""".stripMargin

  /** q24: range join — events assigned to weekly 3-day campaign windows
    * derived from the data's own date bounds, then rolled up per campaign
    * (empty campaigns kept). Executes as a bucketed equi-join
    * (operators.RangeJoin), not a nested loop.
    */
  def rangeJoinCampaigns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val iv = ev.agg(min(to_date($"ts")).as("d0"), max(to_date($"ts")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 7 day)")).as("campaign_start"))
      .withColumn("start_ts", $"campaign_start".cast("timestamp"))
      .withColumn("end_ts", date_add($"campaign_start", 3).cast("timestamp"))
    val matched = graft.operators.RangeJoin
      .pointInInterval(ev, "ts", broadcast(iv), "start_ts", "end_ts")
      .groupBy($"campaign_start")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("tv"))
    iv.select($"campaign_start").join(matched, Seq("campaign_start"), "left")
      .select($"campaign_start",
        coalesce($"n", lit(0L)).as("n_events"),
        coalesce($"tv", lit(0.0)).as("total_value"))
      .orderBy($"campaign_start")
  }

  val rangeJoinCampaignsSql: String =
    """WITH b AS (
      |  SELECT min((ts::TIMESTAMP)::DATE) AS d0, max((ts::TIMESTAMP)::DATE) AS d1
      |  FROM __events__ events),
      |iv AS (
      |  SELECT unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP, INTERVAL 7 DAY))::DATE
      |    AS campaign_start FROM b),
      |m AS (
      |  SELECT iv.campaign_start, count(*) AS n, round(sum(e.value), 2) AS tv
      |  FROM iv JOIN __events__ e
      |    ON e.ts::TIMESTAMP >= iv.campaign_start
      |   AND e.ts::TIMESTAMP < iv.campaign_start + 3
      |  GROUP BY 1)
      |SELECT iv.campaign_start AS campaign_start,
      |  coalesce(m.n, 0)::BIGINT AS n_events,
      |  coalesce(m.tv, 0.0) AS total_value
      |FROM iv LEFT JOIN m USING (campaign_start)
      |ORDER BY campaign_start""".stripMargin

  /** q25: fixed-width histogram of order totals — bucket arithmetic stays
    * in codegen; one partial-agg shuffle regardless of bucket count.
    */
  def histogram(s: SparkSession, dir: String, width: Int = 500): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(floor($"o_totalprice" / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min($"o_totalprice"), 2).as("min_price"),
        round(max($"o_totalprice"), 2).as("max_price"))
      .withColumn("bucket_lo", ($"bucket" * width).cast("double"))
      .select($"bucket", $"bucket_lo", $"n", $"min_price", $"max_price")
      .orderBy($"bucket")
  }

  val histogramSql: String =
    """SELECT floor(o_totalprice / 500)::BIGINT AS bucket,
      |  (floor(o_totalprice / 500)::BIGINT * 500)::DOUBLE AS bucket_lo,
      |  count(*) AS n,
      |  round(min(o_totalprice), 2) AS min_price,
      |  round(max(o_totalprice), 2) AS max_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  /** q26: z-score outlier flagging per event type. The per-type stats are a
    * 5-row aggregate broadcast back onto the stream — NOT a window over
    * partition-by-type (5 partitions = maximal skew at scale).
    */
  def zscoreOutliers(s: SparkSession, dir: String, cut: Double = 2.5): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val stats = ev.groupBy($"event_type")
      .agg(avg($"value").as("mu"), stddev_samp($"value").as("sd"))
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", round(($"value" - $"mu") / $"sd" + lit(1e-9), 4))
      .filter(abs($"z") > cut)
      .select($"event_id", $"event_type", $"value", $"z")
      .orderBy($"event_id")
  }

  val zscoreOutliersSql: String =
    """WITH st AS (
      |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
      |  FROM __events__ events GROUP BY 1)
      |SELECT e.event_id, e.event_type, e.value,
      |  round((e.value - st.mu) / st.sd + 1e-9, 4) AS z
      |FROM (FROM __events__ events WHERE ts IS NOT NULL) e JOIN st USING (event_type)
      |WHERE abs(round((e.value - st.mu) / st.sd + 1e-9, 4)) > 2.5
      |ORDER BY e.event_id""".stripMargin

  /** e07: day-over-day (D1) user retention — the cohort metric. Activity is
    * reduced to distinct (user, day) first, so the self-join carries the
    * small distinct set, not raw events.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val act = Tables.events(s, dir)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val daily = act.groupBy($"day").agg(count(lit(1)).as("n_active"))
    val ret = act.as("a")
      .join(act.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.day") === date_add(col("a.day"), 1))
      .select(col("a.day").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n_retained"))
    daily.join(ret, Seq("day"), "left")
      .select($"day", $"n_active",
        coalesce($"n_retained", lit(0L)).as("n_retained"),
        round(coalesce($"n_retained", lit(0L)) * lit(1.0) / $"n_active" + lit(1e-9), 6)
          .as("retention_d1"))
      .orderBy($"day")
  }

  val retentionSql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, (ts::TIMESTAMP)::DATE AS day FROM __events__ events),
      |daily AS (SELECT day, count(*) AS n_active FROM act GROUP BY 1),
      |ret AS (
      |  SELECT a.day, count(*) AS n_retained
      |  FROM act a JOIN act b ON a.user_id = b.user_id AND b.day = a.day + 1
      |  GROUP BY 1)
      |SELECT d.day AS day, d.n_active AS n_active,
      |  coalesce(r.n_retained, 0)::BIGINT AS n_retained,
      |  round(coalesce(r.n_retained, 0) * 1.0 / d.n_active + 1e-9, 6) AS retention_d1
      |FROM daily d LEFT JOIN ret r USING (day)
      |ORDER BY day""".stripMargin

  /** e08: strict-order funnel (view → later click → later purchase) per
    * user, reported as stage conversion counts. Each stage is one keyed
    * aggregate + one join on user_id — no per-user event sorting.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val c = ev.filter($"event_type" === "click")
      .join(v, Seq("user_id")).filter($"ts" > $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id")).filter($"ts" > $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  val funnelSql: String =
    """WITH v AS (
      |  SELECT user_id, min(ts::TIMESTAMP) AS t_view FROM __events__ events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t_click
      |  FROM (FROM __events__ events WHERE ts IS NOT NULL) e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts::TIMESTAMP > v.t_view GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t_purchase
      |  FROM (FROM __events__ events WHERE ts IS NOT NULL) e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP > c.t_click GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |  (SELECT count(*) FROM c) AS n_view_click,
      |  (SELECT count(*) FROM p) AS n_view_click_purchase""".stripMargin

  /** q27: quartile segmentation of customers by spend WITHIN each nation —
    * ntile is partitioned (a global ntile needs a total order = one
    * reducer; per-group segmentation is the shape that survives scale).
    */
  def ntileSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spend = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("spend"))
      .join(Tables.customer(s, dir)
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
    // NULLS LAST explicit: unknown spend segments into the bottom
    // quartile, never the top (see q31 for the matching ASC pin).
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"spend".desc_nulls_last, $"o_custkey")
    spend.withColumn("quartile", ntile(4).over(w))
      .groupBy($"c_nationkey", $"quartile")
      .agg(count(lit(1)).as("n_customers"),
        round(sum($"spend"), 2).as("quartile_spend"))
      .orderBy($"c_nationkey", $"quartile")
  }

  val ntileSegmentsSql: String =
    """WITH spend AS (
      |  SELECT o.o_custkey, c.c_nationkey, round(sum(o.o_totalprice), 2) AS spend
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |seg AS (
      |  SELECT c_nationkey, spend, ntile(4) OVER (
      |    PARTITION BY c_nationkey ORDER BY spend DESC NULLS LAST, o_custkey) AS quartile
      |  FROM spend)
      |SELECT c_nationkey, quartile, count(*) AS n_customers,
      |  round(sum(spend), 2) AS quartile_spend
      |FROM seg GROUP BY 1, 2
      |ORDER BY c_nationkey, quartile""".stripMargin

  /** q28: deterministic ordered string aggregation — first-5 supplier
    * names per nation (sorted before truncation so the result is stable
    * regardless of partitioning; collect_list alone is order-undefined).
    */
  def listaggSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.supplier(s, dir)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        concat_ws(",", slice(sort_array(collect_list($"s_name")), 1, 5))
          .as("sample_names"))
      .orderBy($"s_nationkey")
  }

  val listaggSampleSql: String =
    """SELECT s_nationkey, count(*) AS n_suppliers,
      |  array_to_string(list_sort(list(s_name))[1:5], ',') AS sample_names
      |FROM supplier
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** q29: SCD Type-2 build — each customer's order-priority history as
    * validity intervals [valid_from, valid_to) via lead() (NULL = current).
    * One shuffle on the key, ordered window within partition — the
    * standard change-capture shape for a slowly-changing dimension.
    *
    * NULL-date contract (GenAdversarial, the e10/e14 lesson on the
    * relational side): an undated change record is unorderable, and the
    * two engines disagree about ascending defaults — Spark sorts NULL
    * FIRST, DuckDB LAST — so the chain position is pinned EXPLICITLY:
    * NULLS FIRST in both. Semantically: unknown effective date =
    * presumed-oldest; the record is superseded by the first dated one
    * and can never claim `is_current`.
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderpriority",
        to_date($"o_orderdate").as("valid_from"))
      .withColumn("valid_to",
        coalesce(lead($"valid_from", 1).over(
          Window.partitionBy($"o_custkey")
            .orderBy($"valid_from".asc_nulls_first, $"o_orderkey")),
          to_date(lit("2200-01-01"))))
      .withColumn("is_current", $"valid_to" === to_date(lit("2200-01-01")))
      // presentation sort carries the same explicit placement as the
      // window: NULL custkey and NULL valid_from rows reach the output
      .orderBy($"o_custkey".asc_nulls_first, $"valid_from".asc_nulls_first,
        $"o_orderkey")
  }

  val scd2IntervalsSql: String =
    """SELECT o_custkey, o_orderkey, o_orderpriority,
      |  o_orderdate::DATE AS valid_from,
      |  coalesce(lead(o_orderdate::DATE) OVER w, DATE '2200-01-01') AS valid_to,
      |  coalesce(lead(o_orderdate::DATE) OVER w, DATE '2200-01-01') = DATE '2200-01-01'
      |    AS is_current
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate::DATE NULLS FIRST, o_orderkey)
      |ORDER BY o_custkey NULLS FIRST, valid_from NULLS FIRST, o_orderkey""".stripMargin

  /** q30: weighted corpus mixing — per-source Bernoulli sampling with
    * deterministic, engine-portable randomness: keep a doc when the first
    * two hex chars of md5(doc_id) fall below the source's cutoff
    * (cutoff/256 = sampling rate). Map-only — no shuffle at any corpus
    * size; the mixing-table join is a broadcast.
    */
  def weightedMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // rates: even sources 75% (cutoff 0xC0), odd sources 25% (cutoff
    // 0x40). A source whose suffix isn't an int (or a NULL source)
    // takes the odd cutoff: Spark's lenient cast NULLs it into the
    // otherwise-branch, and the oracle's try_cast does the same —
    // strict ::INT would abort the whole oracle query on one such row
    // (GenAdversarial).
    val coin = substring(md5($"doc_id".cast("string")), 1, 2)
    Tables.documents(s, dir)
      .withColumn("cutoff",
        when(expr("cast(substring(source, 4) AS int) % 2 = 0"), lit("c0"))
          .otherwise(lit("40")))
      .filter(coin < $"cutoff")
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  val weightedMixSql: String =
    """SELECT doc_id, source
      |FROM documents
      |WHERE substr(md5(doc_id::VARCHAR), 1, 2) <
      |  CASE WHEN try_cast(substr(source, 4) AS INT) % 2 = 0
      |    THEN 'c0' ELSE '40' END
      |ORDER BY doc_id""".stripMargin

  /** q31: percent_rank of customer spend within nation — the relative-
    * standing window (partitioned, so no global sort). Rounded with the
    * tie-break epsilon; rank basis is (rounded spend, custkey) so both
    * engines order identically.
    */
  def percentRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spend = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("spend"))
      .join(Tables.customer(s, dir)
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
    // NULLS FIRST explicit — the latent ASC divergence the adversarial
    // corpus was built to catch (Spark ASC defaults NULLS FIRST, DuckDB
    // NULLS LAST; a customer whose orders all carry NULL totalprice hits
    // it). Contract matches q27: unknown spend ranks LOWEST.
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"spend".asc_nulls_first, $"o_custkey")
    spend.select($"c_nationkey", $"o_custkey", $"spend",
        round(percent_rank().over(w) + lit(1e-9), 6).as("pct_rank"),
        round(cume_dist().over(w) + lit(1e-9), 6).as("cume"))
      .orderBy($"c_nationkey", $"o_custkey")
  }

  val percentRankSql: String =
    """WITH spend AS (
      |  SELECT o.o_custkey, c.c_nationkey, round(sum(o.o_totalprice), 2) AS spend
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2)
      |SELECT c_nationkey, o_custkey, spend,
      |  round(percent_rank() OVER w + 1e-9, 6) AS pct_rank,
      |  round(cume_dist() OVER w + 1e-9, 6) AS cume
      |FROM spend
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY spend NULLS FIRST, o_custkey)
      |ORDER BY c_nationkey, o_custkey""".stripMargin

  /** q32: unpivot (melt) — the q18 pivot's inverse: per-source language
    * counts as (source, lang, n) long form via stack(). The reshaping
    * primitive stays a map-only Expand; no shuffle beyond the input agg.
    */
  def unpivotLangs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val langs = Seq("en", "fr", "es", "de", "zz")
    val wide = Tables.documents(s, dir)
      .groupBy($"source")
      .pivot("lang", langs)
      .agg(count(lit(1)))
      .na.fill(0L)
    val stackExpr = langs.map(l => s"'$l', `$l`").mkString(", ")
    wide.select($"source",
        expr(s"stack(${langs.size}, $stackExpr) AS (lang, n)"))
      .select($"source", $"lang", $"n")
      .filter($"n" > 0)
      .orderBy($"source", $"lang")
  }

  val unpivotLangsSql: String =
    """SELECT source, lang, count(*) AS n
      |FROM documents
      |WHERE lang IN ('en', 'fr', 'es', 'de', 'zz')
      |GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  /** e09: one-pass approximate quantiles per event type via the mergeable
    * QuantileHistogram typed Aggregator (error ≤ bin width; merge is
    * vector addition so the answer is deterministic under any partitioning
    * — the property that makes it safe as a 100 TB monitoring rollup).
    * The final quantile walk runs over 5 result rows; rows-only (the
    * sketch isn't SQL-portable), accuracy pinned in TypedAggSpec.
    */
  def quantileSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qh = new graft.functions.TypedAggregators.QuantileHistogram(0.0, 600.0, 256)
    val sketch = udaf(qh, org.apache.spark.sql.Encoders.scalaDouble)
    val quant = udf((counts: Seq[Long], q: Double) =>
      qh.quantile(counts.toArray, q))
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(sketch($"value").as("hist"))
      .select($"event_type",
        round(quant($"hist", lit(0.5)), 4).as("p50_approx"),
        round(quant($"hist", lit(0.9)), 4).as("p90_approx"),
        round(quant($"hist", lit(0.99)), 4).as("p99_approx"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e09_quantile_sketch" -> quantileSketch _,
    "q27_ntile_segments" -> ntileSegments _,
    "q28_listagg_sample" -> listaggSample _,
    "q29_scd2_intervals" -> scd2Intervals _,
    "q30_weighted_mix" -> weightedMix _,
    "q31_percent_rank" -> percentRank _,
    "q32_unpivot" -> unpivotLangs _,
    "q21_cube" -> cubeRollup _,
    "q38_grouping_sets" -> groupingSetsReport _,
    "q22_corr_stats" -> corrStats _,
    "q23_topk_rank" -> topkRank _,
    "q24_range_join" -> rangeJoinCampaigns _,
    "q25_histogram" -> ((s: SparkSession, d: String) => histogram(s, d)),
    "q26_zscore_outliers" -> ((s: SparkSession, d: String) => zscoreOutliers(s, d)),
    "e07_retention" -> retention _,
    "e08_funnel" -> funnel _)

  val oracles: Map[String, String] = Events.withEventsView(Map(
    "q27_ntile_segments" -> ntileSegmentsSql,
    "q28_listagg_sample" -> listaggSampleSql,
    "q29_scd2_intervals" -> scd2IntervalsSql,
    "q30_weighted_mix" -> weightedMixSql,
    "q31_percent_rank" -> percentRankSql,
    "q32_unpivot" -> unpivotLangsSql,
    "q21_cube" -> cubeRollupSql,
    "q38_grouping_sets" -> groupingSetsReportSql,
    "q22_corr_stats" -> corrStatsSql,
    "q23_topk_rank" -> topkRankSql,
    "q24_range_join" -> rangeJoinCampaignsSql,
    "q25_histogram" -> histogramSql,
    "q26_zscore_outliers" -> zscoreOutliersSql,
    "e07_retention" -> retentionSql,
    "e08_funnel" -> funnelSql))
}
