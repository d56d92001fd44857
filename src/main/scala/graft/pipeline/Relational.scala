package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational / pipeline-core operators (SURVEY.md §2, reference-derived).
  *
  * Re-expresses the reference's pandas/dict loops as declarative Spark plans:
  * incremental anti-joins (reference run_full_pipeline.py:353-395), set
  * reconciliation (get_download_list.py:57-58), duplicate audits
  * (check_unique_hashes.py:45-60), backfill merge
  * (backfill_download_metadata.py:106-201), multi-format date normalization
  * (website/generate_website_data.py:23-62).
  *
  * Scale notes (100 TB): every agg here is partial-aggregatable (map-side
  * combine); dimension sides of joins are broadcast; the only shuffles are
  * on the grouping / join keys themselves. Window top-1-per-key (q03) uses a
  * single hash shuffle on the partition key.
  */
object Relational {

  /** One referential-integrity admission check: `fkCol` must resolve in
    * `dim`'s `dimKey` column (NULL fk is allowed — that's a separate
    * nullability policy, and q39 counts it separately too).
    */
  case class FkCheck(fkCol: String, dim: DataFrame, dimKey: String)

  /** One embedding-column admission check — the row-level form of q39's
    * embeddings block: `dim` > 0 additionally pins the expected
    * dimensionality (the corpus-level ragged_dims check made per-row).
    */
  case class VectorCheck(col: String, dim: Int = 0)

  /** The row-level admission form of q39's whole-lake audit: which
    * checks a batch must pass before it is admitted to the store.
    */
  case class AdmissionChecks(
      pk: Option[String] = None,
      fks: Seq[FkCheck] = Nil,
      finiteCols: Seq[String] = Nil,
      vectors: Seq[VectorCheck] = Nil)

  /** q39 made actionable (verdict r16 #5): instead of REPORTING bad-row
    * counts per table, tag each row of an arriving batch with the
    * admission checks it violates — `_violations: array<string>`, empty
    * for a clean row — so a streaming gate can dead-letter exactly the
    * violating rows and admit the rest (the Tables.events null-ts DLQ
    * discipline generalized to dup-PK / dangling-FK / non-finite).
    *
    * Semantics per check, mirroring q39's counting:
    *  - `dup_pk`: rows beyond the FIRST per PK value (deterministic
    *    keeper: min xxhash64 of the full row, then the hash order makes
    *    ties interchangeable because tied rows are identical);
    *  - `dangling_<fk>`: non-NULL fk with no match in the dim (dims are
    *    broadcast — admission dims are small by construction);
    *  - `nonfinite_<col>`: NaN/±Inf in a declared measure column.
    *
    * Scale shape: one batch-local window per PK check, broadcast left
    * joins for FKs, row-local predicates for the finite checks — cost is
    * O(batch), never store-sized.
    */
  def admissionAudit(batch: DataFrame, checks: AdmissionChecks): DataFrame = {
    import batch.sparkSession.implicits._
    val cols = batch.columns.toSeq
    var df = batch
    var viol = Seq.empty[org.apache.spark.sql.Column]
    checks.pk.foreach { pk =>
      val w = Window.partitionBy(col(pk))
        .orderBy(xxhash64(struct(cols.map(col): _*)))
      df = df.withColumn("_pk_rn", row_number().over(w))
      // NULL PKs are NOT duplicates of each other — q39's count(pk) −
      // countDistinct(pk) skips null-keyed rows in both engines, and
      // null-PK admission is a separate nullability policy (same stance
      // as the FK check's isNotNull guard)
      viol :+= when(col(pk).isNotNull && col("_pk_rn") > 1, lit("dup_pk"))
    }
    checks.fks.zipWithIndex.foreach { case (fk, i) =>
      val flag = s"_fk_ok_$i"
      val dimKeys = fk.dim.select(col(fk.dimKey).as(s"_dim_key_$i"))
        .distinct().withColumn(flag, lit(true))
      df = df.join(broadcast(dimKeys),
        df(fk.fkCol) === col(s"_dim_key_$i"), "left")
      viol :+= when(col(fk.fkCol).isNotNull && col(flag).isNull,
        lit(s"dangling_${fk.fkCol}"))
    }
    checks.finiteCols.foreach { c =>
      viol :+= when(isnan(col(c)) ||
        col(c) === lit(Double.PositiveInfinity) ||
        col(c) === lit(Double.NegativeInfinity), lit(s"nonfinite_$c"))
    }
    checks.vectors.foreach { vc =>
      val c = vc.col
      // q39's embeddings block made per-row: NULL components (the shape
      // that crashes typed training paths), non-finite components, the
      // zero vector (undefined cosine), and — when dim is pinned — the
      // ragged row. A NULL vector itself is the no-embedding policy
      // question, left to the caller like NULL PKs.
      viol :+= when(col(c).isNotNull &&
        expr(s"exists($c, x -> x IS NULL)"), lit(s"nullcomp_$c"))
      viol :+= when(col(c).isNotNull &&
        expr(s"exists($c, x -> isnan(CAST(x AS DOUBLE)) " +
          s"OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE))"),
        lit(s"nonfinite_$c"))
      viol :+= when(col(c).isNotNull && size(col(c)) > 0 &&
        !expr(s"exists($c, x -> x IS NULL)") &&
        expr(s"aggregate($c, CAST(0.0 AS DOUBLE), " +
          s"(a, x) -> a + abs(CAST(x AS DOUBLE))) = 0.0"),
        lit(s"zerovec_$c"))
      if (vc.dim > 0)
        viol :+= when(col(c).isNotNull && size(col(c)) =!= vc.dim,
          lit(s"baddim_$c"))
    }
    val arr =
      if (viol.isEmpty) array().cast("array<string>")
      else filter(array(viol: _*), x => x.isNotNull)
    df.withColumn("_violations", arr)
      .select(cols.map(col) :+ col("_violations"): _*)
  }

  /** q01: filtered multi-aggregate scan (TPC-H Q1 family).
    * Partial aggregation + codegen; filter and 7-column projection are
    * pushed to the parquet scan.
    */
  def pricingAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity") + lit(1e-9), 4).as("avg_qty"),
        round(avg($"l_discount") + lit(1e-9), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val pricingAggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
      |  round(avg(l_discount) + 1e-9, 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02: star join + rollup (reference: per-agency rollup joined with
    * facility info, generate_website_data.py:308-326).
    * nation/region are broadcast (tiny dims at any scale); customer joins
    * orders via hash shuffle on custkey — AQE handles skew at scale.
    */
  def joinAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir))
    o.join(c, $"o_custkey" === $"c_custkey")
      .join(n, $"c_nationkey" === $"n_nationkey")
      .join(r, $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("revenue"),
        countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"r_name", $"n_name")
  }

  val joinAggSql: String =
    """SELECT r_name, n_name,
      |  count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue,
      |  count(DISTINCT o_custkey) AS n_customers
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q03: latest record per key (reference: latest document per agency).
    * Window row_number over a single shuffle on the key; at 100 TB this
    * beats a self-join-on-max and stays in one exchange.
    *
    * NULLS LAST is explicit (GenAdversarial): an undated record must
    * never win "latest". Spark's DESC default happens to agree, DuckDB's
    * happens to agree too — but agreement-by-default is exactly what the
    * q29 divergence punished, so every window over a nullable key pins
    * its placement.
    */
  def latestPerKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc_nulls_last, $"o_orderkey".desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      // presentation sort pinned too: a NULL-custkey order forms its own
      // window partition and SURVIVES into the output, so the final
      // row order the driver hashes needs the same explicit placement
      .orderBy($"o_custkey".asc_nulls_first)
  }

  val latestPerKeySql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey NULLS FIRST""".stripMargin

  /** q04: incremental anti-join (reference: download only ids with no
    * SHA-backed record, run_full_pipeline.py:361-365).
    * left_anti = one shuffle; with AQE the smaller side broadcasts.
    */
  def antijoinIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val recent = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
    c.join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val antijoinIncrementalSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** q05: semi-join (reference: "already processed" membership check,
    * extract_pdf_text.py:191).
    */
  def semijoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
    c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val semijoinSql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** q06: two-way set reconciliation (reference: missing/extra files,
    * get_download_list.py:57-58). Expressed as tagged anti-joins over
    * deduplicated key sets — two shuffles total, each on the key.
    */
  def setdiffAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val expected = Tables.part(s, dir).filter($"p_size" > 25)
      .select($"p_partkey".as("key")).distinct()
    val actual = Tables.lineitem(s, dir).filter($"l_quantity" > 40)
      .select($"l_partkey".as("key")).distinct()
    val missing = expected.join(actual, Seq("key"), "left_anti")
      .withColumn("side", lit("missing"))
    val extra = actual.join(expected, Seq("key"), "left_anti")
      .withColumn("side", lit("extra"))
    missing.unionByName(extra).select($"side", $"key").orderBy($"side", $"key")
  }

  val setdiffAuditSql: String =
    """WITH expected AS (SELECT DISTINCT p_partkey AS key FROM part WHERE p_size > 25),
      |     actual AS (SELECT DISTINCT l_partkey AS key FROM lineitem WHERE l_quantity > 40)
      |SELECT 'missing' AS side, key FROM expected WHERE key NOT IN (SELECT key FROM actual)
      |UNION ALL
      |SELECT 'extra' AS side, key FROM actual WHERE key NOT IN (SELECT key FROM expected)
      |ORDER BY side, key""".stripMargin

  /** q07: content-hash uniqueness audit (check_unique_hashes.py:45-60).
    * Distinct-count over a derived hash: partial aggregation, one shuffle.
    */
  def dupAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      // 16-byte binary digest: `h` only feeds countDistinct's shuffle
      // (never the output), so the hex doubling buys nothing.
      .select(unhex(md5($"text")).as("h"))
      .agg(
        count(lit(1)).as("total_hashes"),
        countDistinct($"h").as("unique_hashes"),
        (count(lit(1)) - countDistinct($"h")).as("duplicate_count"))
  }

  val dupAuditSql: String =
    """SELECT count(*) AS total_hashes,
      |  count(DISTINCT md5(text)) AS unique_hashes,
      |  count(*) - count(DISTINCT md5(text)) AS duplicate_count
      |FROM documents""".stripMargin

  /** q13: backfill merge-overlay (backfill_download_metadata.py:106-112):
    * fill missing attributes of a base record set from an overlay keyed
    * lookup, preferring existing non-empty values. Left join + coalesce —
    * the overlay (dim-sized) broadcasts.
    */
  def backfillMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Base: customers with acctbal "missing" for one segment (simulates the
    // reference's rows lacking sha256); overlay: per-nation average balance.
    val c = Tables.customer(s, dir)
    val base = c.select(
      $"c_custkey", $"c_nationkey",
      when($"c_mktsegment" === "BUILDING", lit(null).cast("double"))
        .otherwise($"c_acctbal").as("acctbal"))
    val overlay = c.groupBy($"c_nationkey".as("nk"))
      .agg(round(avg($"c_acctbal") + lit(1e-9), 2).as("nation_avg"))
    base.join(broadcast(overlay), $"c_nationkey" === $"nk", "left")
      .select(
        $"c_custkey",
        round(coalesce($"acctbal", $"nation_avg", lit(0.0)), 2).as("acctbal_filled"),
        ($"acctbal".isNull).as("was_backfilled"))
      .orderBy($"c_custkey")
  }

  val backfillMergeSql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_nationkey,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_acctbal END AS acctbal
      |  FROM customer),
      |overlay AS (
      |  SELECT c_nationkey AS nk, round(avg(c_acctbal) + 1e-9, 2) AS nation_avg
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_custkey,
      |  round(coalesce(acctbal, nation_avg, 0.0), 2) AS acctbal_filled,
      |  acctbal IS NULL AS was_backfilled
      |FROM base LEFT JOIN overlay ON c_nationkey = nk
      |ORDER BY c_custkey""".stripMargin

  /** q14: multi-format date normalization (generate_website_data.py:23-62,
    * which also handles two-digit years): strings in M/D/Y, "Month D, Y",
    * ISO, and M/D/YY (two-digit year) forms → ISO date. A cheap regex
    * guard dispatches each row to the ONE format that can match, so the
    * formatter parses each string exactly once — the naive
    * coalesce(to_date, to_date, …) chain pays an internal parse-exception
    * per non-matching format per row, which made it the slowest map-only
    * query in the suite (1.8 s vs 0.6 s). Result is identical: a guarded
    * branch that then fails to parse still yields null, exactly like the
    * fallback chain. The two-digit-year branch uses explicit POSIX century
    * arithmetic (< 70 → 2000s, else 1900s) via make_date rather than a
    * "yy" pattern: engines disagree on the 2-digit pivot, the arithmetic
    * is engine-portable.
    */
  def dateNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = Tables.orders(s, dir).select(
      $"o_orderkey",
      when($"o_orderkey" % 4 === 0, date_format($"o_orderdate", "MM/dd/yyyy"))
        .when($"o_orderkey" % 4 === 1, date_format($"o_orderdate", "MMMM d, yyyy"))
        .when($"o_orderkey" % 4 === 2, date_format($"o_orderdate", "M/d/yy"))
        .otherwise(date_format($"o_orderdate", "yyyy-MM-dd")).as("raw_date"))
    val y2 = regexp_extract($"raw_date", "/([0-9]{2})$", 1).cast("int")
    raw.select(
        $"o_orderkey", $"raw_date",
        when($"raw_date".rlike("^[0-9]{2}/[0-9]{2}/[0-9]{4}$"),
            to_date($"raw_date", "MM/dd/yyyy"))
          .when($"raw_date".rlike("^[0-9]{1,2}/[0-9]{1,2}/[0-9]{2}$"),
            make_date(
              when(y2 < 70, y2 + 2000).otherwise(y2 + 1900),
              regexp_extract($"raw_date", "^([0-9]{1,2})/", 1).cast("int"),
              regexp_extract($"raw_date", "^[0-9]{1,2}/([0-9]{1,2})/", 1).cast("int")))
          .when($"raw_date".rlike("^[0-9]{4}-"), to_date($"raw_date", "yyyy-MM-dd"))
          .otherwise(to_date($"raw_date", "MMMM d, yyyy")).as("date_iso"))
      .orderBy($"o_orderkey")
  }

  val dateNormalizeSql: String =
    """WITH raw AS (
      |  SELECT o_orderkey,
      |    CASE
      |      WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%m/%d/%Y')
      |      WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%B ')
      |        || day(o_orderdate) || ', ' || year(o_orderdate)
      |      WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%-m/%-d/%y')
      |      ELSE strftime(o_orderdate, '%Y-%m-%d')
      |    END AS raw_date
      |  FROM orders)
      |SELECT o_orderkey, raw_date,
      |  CASE
      |    WHEN regexp_matches(raw_date, '^[0-9]{2}/[0-9]{2}/[0-9]{4}$')
      |      THEN try_strptime(raw_date, '%m/%d/%Y')::DATE
      |    WHEN regexp_matches(raw_date, '^[0-9]{1,2}/[0-9]{1,2}/[0-9]{2}$')
      |      THEN make_date(
      |        CASE WHEN regexp_extract(raw_date, '/([0-9]{2})$', 1)::INT < 70
      |          THEN regexp_extract(raw_date, '/([0-9]{2})$', 1)::INT + 2000
      |          ELSE regexp_extract(raw_date, '/([0-9]{2})$', 1)::INT + 1900 END,
      |        regexp_extract(raw_date, '^([0-9]{1,2})/', 1)::INT,
      |        regexp_extract(raw_date, '^[0-9]{1,2}/([0-9]{1,2})/', 1)::INT)
      |    WHEN regexp_matches(raw_date, '^[0-9]{4}-')
      |      THEN try_strptime(raw_date, '%Y-%m-%d')::DATE
      |    ELSE try_strptime(raw_date, '%B %d, %Y')::DATE
      |  END AS date_iso
      |FROM raw
      |ORDER BY o_orderkey""".stripMargin

  /** q15: fact-fact join chain + rollup (TPC-H Q5 shape): lineitem joins
    * orders on the shuffle key, dims broadcast. The one genuinely large
    * shuffle in the suite — the plan AQE would skew-split at 100 TB.
    */
  def revenueChain(s: SparkSession, dir: String): DataFrame =
    revenueChainOf(Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.customer(s, dir), Tables.nation(s, dir), Tables.region(s, dir))

  /** Core of [[revenueChain]] over explicit inputs (the skew probe feeds
    * it hot-key variants of the fact tables).
    */
  def revenueChainOf(li: DataFrame, o: DataFrame, c: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val s = li.sparkSession
    import s.implicits._
    val n = broadcast(nation)
    val r = broadcast(region)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(n, $"c_nationkey" === $"n_nationkey")
      .join(r, $"n_regionkey" === $"r_regionkey")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy($"n_name")
  }

  val revenueChainSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** q17: hierarchical rollup with subtotals (GROUPING SETS family) —
    * region → nation → grand total in one pass (partial-agg friendly;
    * Spark expands grouping sets before the single shuffle).
    */
  def regionRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir))
    o.join(c, $"o_custkey" === $"c_custkey")
      .join(n, $"c_nationkey" === $"n_nationkey")
      .join(r, $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("revenue"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val regionRollupSql: String =
    """SELECT r_name, n_name, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** q36: CDC changelog merge (MERGE INTO / SCD Type-1 semantics) — the
    * incremental-maintenance primitive the reference approximates with
    * its per-run dict overlays (run_full_pipeline.py:353-431 applies
    * "latest wins" record updates batch by batch). A changelog keyed by
    * customer is derived from orders (status P ⇒ delete, else upsert of
    * the order total, ordered by (o_orderdate, o_orderkey)); applying it
    * to the customer snapshot yields kept / updated rows and drops
    * deletes.
    *
    * Scale shape: last-change-per-key is a partial-aggregatable
    * `max_by(struct(op, val), struct(date, key))` — the d09 pattern, one
    * shuffle on the merge key and NO per-key window sort — followed by a
    * single full-outer shuffle join against the snapshot on the same key
    * (co-partitioned, so AQE plans one exchange each side). That is the
    * exact physical shape a 100 TB MERGE INTO compiles to.
    */
  def cdcMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.customer(s, dir).select($"c_custkey", $"c_acctbal")
    val lastChange = Tables.orders(s, dir)
      .select($"o_custkey".as("key"),
        when($"o_orderstatus" === "P", lit("delete"))
          .otherwise(lit("upsert")).as("op"),
        $"o_totalprice".as("val"), $"o_orderdate", $"o_orderkey")
      .groupBy($"key")
      .agg(expr("max_by(struct(op, val), struct(o_orderdate, o_orderkey))")
        .as("m"))
      .select($"key", $"m.op".as("op"), $"m.val".as("val"))
    base.join(lastChange, $"c_custkey" === $"key", "full_outer")
      .filter(coalesce($"op", lit("keep")) =!= "delete")
      .select(
        coalesce($"c_custkey", $"key").as("custkey"),
        round(coalesce($"val", $"c_acctbal"), 2).as("balance"),
        when($"op".isNull, lit("kept"))
          .when($"c_custkey".isNull, lit("inserted"))
          .otherwise(lit("updated")).as("status"))
      .orderBy($"custkey")
  }

  val cdcMergeSql: String =
    """WITH log AS (
      |  SELECT o_custkey AS key,
      |    CASE WHEN o_orderstatus = 'P' THEN 'delete' ELSE 'upsert' END AS op,
      |    o_totalprice AS val,
      |    row_number() OVER (
      |      PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders),
      |last AS (SELECT key, op, val FROM log WHERE rn = 1)
      |SELECT coalesce(c_custkey, key) AS custkey,
      |  round(coalesce(val, c_acctbal), 2) AS balance,
      |  CASE WHEN op IS NULL THEN 'kept'
      |       WHEN c_custkey IS NULL THEN 'inserted'
      |       ELSE 'updated' END AS status
      |FROM customer FULL OUTER JOIN last ON c_custkey = key
      |WHERE coalesce(op, 'keep') <> 'delete'
      |ORDER BY custkey""".stripMargin

  /** q39: ingest-validation audit — the data-quality report a lake runs
    * before admitting a batch, measuring exactly the hostile shapes the
    * adversarial gate plants (and a clean corpus reports as zeros):
    * duplicate primary keys, NULL and DANGLING foreign keys, undated
    * records, and non-finite measures. The reference runs this shape as
    * scattered per-file assertions (check_unique_hashes.py:9-78,
    * get_download_list.py:21-104); here it is one long-form report.
    *
    * Scale shape (100 TB): each table's row-local checks (null keys,
    * non-finite measures, dup-PK excess) compute in ONE scan via a
    * single conditional aggregation — count/count-distinct are
    * partial-aggregatable, stack() melts the one result row map-side.
    * Referential checks are anti-join counts on the FK (broadcast dims;
    * the orders→customer / lineitem→orders audits shuffle on the same
    * keys every downstream join uses). No windows, no per-key state.
    */
  def qualityAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def nonfinite(c: org.apache.spark.sql.Column) =
      sum(when(isnan(c) || c === lit(Double.PositiveInfinity) ||
        c === lit(Double.NegativeInfinity), 1L).otherwise(0L))
    def nulls(c: org.apache.spark.sql.Column) =
      sum(when(c.isNull, 1L).otherwise(0L))

    // one conditional-aggregation scan per table, melted to long form
    val cust = Tables.customer(s, dir).agg(
        (count($"c_custkey") - countDistinct($"c_custkey")).as("dup_pk"),
        nulls($"c_nationkey").as("null_fk_nation"),
        nonfinite($"c_acctbal").as("nonfinite_acctbal"))
      .selectExpr("stack(3, 'dup_pk', dup_pk, " +
        "'null_fk_nation', null_fk_nation, " +
        "'nonfinite_acctbal', nonfinite_acctbal) AS (check, n_bad)")
      .withColumn("table_name", lit("customer"))
    val ord = Tables.orders(s, dir).agg(
        (count($"o_orderkey") - countDistinct($"o_orderkey")).as("dup_pk"),
        nulls($"o_custkey").as("null_fk_cust"),
        nulls($"o_orderdate").as("null_date"),
        nonfinite($"o_totalprice").as("nonfinite_price"))
      .selectExpr("stack(4, 'dup_pk', dup_pk, 'null_fk_cust', null_fk_cust, " +
        "'null_date', null_date, 'nonfinite_price', nonfinite_price) " +
        "AS (check, n_bad)")
      .withColumn("table_name", lit("orders"))
    val li = Tables.lineitem(s, dir).agg(
        // composite-PK dup check over rows where BOTH parts are non-null:
        // Spark's multi-col countDistinct skips any-null rows, DuckDB's
        // row-value DISTINCT counts (NULL, x) tuples — restricting both
        // sides to fully-keyed rows makes the semantics identical.
        // coalesce: on an EMPTY lineitem table sum() is NULL while the
        // oracle's count(*) is 0 — pin both sides to 0, like dangling()
        (coalesce(sum(when($"l_orderkey".isNotNull && $"l_linenumber".isNotNull,
          1L).otherwise(0L)), lit(0L)) -
          countDistinct($"l_orderkey", $"l_linenumber")).as("dup_pk"),
        nonfinite($"l_extendedprice").as("nonfinite_price"))
      .selectExpr("stack(2, 'dup_pk', dup_pk, " +
        "'nonfinite_price', nonfinite_price) AS (check, n_bad)")
      .withColumn("table_name", lit("lineitem"))
    val supp = Tables.supplier(s, dir).agg(
        (count($"s_suppkey") - countDistinct($"s_suppkey")).as("dup_pk"),
        nulls($"s_nationkey").as("null_fk_nation"))
      .selectExpr("stack(2, 'dup_pk', dup_pk, " +
        "'null_fk_nation', null_fk_nation) AS (check, n_bad)")
      .withColumn("table_name", lit("supplier"))
    val prt = Tables.part(s, dir).agg(
        (count($"p_partkey") - countDistinct($"p_partkey")).as("dup_pk"))
      .selectExpr("stack(1, 'dup_pk', dup_pk) AS (check, n_bad)")
      .withColumn("table_name", lit("part"))
    // the corpus side of the lake: identity drift + the preconditions
    // the text/vector families declare (NULL text is a measured fact —
    // the m-family contract admits contentless docs; a non-finite or
    // ragged embedding is what the s-family's finite-uniform
    // precondition REJECTS, and this audit is the gate that rejects it)
    val docs = Tables.documents(s, dir).agg(
        (count($"doc_id") - countDistinct($"doc_id")).as("dup_pk"),
        nulls($"text").as("null_text"),
        sum(when($"n_chars".isNotNull && $"text".isNotNull &&
          $"n_chars" =!= length($"text").cast("long"), 1L).otherwise(0L))
          .as("nchars_drift"))
      .selectExpr("stack(3, 'dup_pk', dup_pk, 'null_text', null_text, " +
        "'nchars_drift', nchars_drift) AS (check, n_bad)")
      .withColumn("table_name", lit("documents"))
    val emb = Tables.embeddings(s, dir).agg(
        (count($"vec_id") - countDistinct($"vec_id")).as("dup_pk"),
        // DOUBLE-cast infinity test (not a FLOAT-max threshold): exact
        // for float or double embeddings, matching DuckDB's isfinite
        sum(when(expr("exists(embedding, x -> isnan(CAST(x AS DOUBLE)) " +
          "OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE))"),
          1L).otherwise(0L)).as("nonfinite_component"),
        // non-empty guard: DuckDB's list_sum([]) is NULL while Spark's
        // aggregate over [] is the 0.0 seed — both sides skip empties.
        // no-NULL-component guard: Spark's 0.0 + NULL = NULL (row not
        // counted) but DuckDB's list_sum SKIPS NULL elements (a
        // zeros-with-NULL vector would count) — exclude such vectors
        // explicitly on both sides so the engines agree by construction
        sum(when(expr("size(embedding) > 0 AND " +
          "NOT exists(embedding, x -> x IS NULL) AND aggregate(embedding, " +
          "CAST(0.0 AS DOUBLE), (a, x) -> a + abs(CAST(x AS DOUBLE))) = 0.0"),
          1L).otherwise(0L)).as("zero_vector"),
        // NULL guard: non-ANSI size(NULL) = -1 would count as an extra
        // distinct dimension; DuckDB's count DISTINCT skips NULL len
        (countDistinct(when($"embedding".isNotNull, size($"embedding")))
          - lit(1L)).as("ragged_dims"))
      .selectExpr("stack(4, 'dup_pk', dup_pk, " +
        "'nonfinite_component', nonfinite_component, " +
        "'zero_vector', zero_vector, 'ragged_dims', ragged_dims) " +
        "AS (check, n_bad)")
      .withColumn("table_name", lit("embeddings"))

    // referential integrity: pre-aggregate the fact side to (key, n)
    // BEFORE the anti-join — the shuffle carries distinct FK values
    // (15M orderkeys, not 60M lineitem rows at sf10: 1055 → ~400 MB
    // measured), the partial agg combines map-side, and the missing-key
    // row count comes back as sum(n).
    def dangling(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
        table: String, check: String): DataFrame =
      fact.filter(col(fk).isNotNull)
        .groupBy(col(fk)).agg(count(lit(1)).as("n"))
        .join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
        .agg(coalesce(sum($"n"), lit(0L)).as("n_bad"))
        .select(lit(check).as("check"), $"n_bad")
        .withColumn("table_name", lit(table))
    val nat = broadcast(Tables.nation(s, dir))
    val refs = Seq(
      dangling(Tables.customer(s, dir), "c_nationkey", nat, "n_nationkey",
        "customer", "dangling_nation"),
      dangling(Tables.supplier(s, dir), "s_nationkey", nat, "n_nationkey",
        "supplier", "dangling_nation"),
      dangling(Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey", "orders", "dangling_cust"),
      dangling(Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey", "lineitem", "dangling_order"),
      dangling(Tables.lineitem(s, dir), "l_partkey",
        Tables.part(s, dir), "p_partkey", "lineitem", "dangling_part"),
      dangling(Tables.lineitem(s, dir), "l_suppkey",
        Tables.supplier(s, dir), "s_suppkey", "lineitem", "dangling_supp"))

    (Seq(cust, ord, li, supp, prt, docs, emb) ++ refs)
      .map(_.select($"table_name", $"check", $"n_bad"))
      .reduce(_ unionByName _)
      .orderBy($"table_name", $"check")
  }

  val qualityAuditSql: String =
    """SELECT * FROM (
      |  SELECT 'customer' AS table_name, 'dup_pk' AS "check",
      |    count(c_custkey) - count(DISTINCT c_custkey) AS n_bad FROM customer
      |  UNION ALL SELECT 'customer', 'null_fk_nation',
      |    count(*) FILTER (c_nationkey IS NULL) FROM customer
      |  UNION ALL SELECT 'customer', 'nonfinite_acctbal',
      |    count(*) FILTER (c_acctbal IS NOT NULL AND NOT isfinite(c_acctbal)) FROM customer
      |  UNION ALL SELECT 'customer', 'dangling_nation',
      |    count(*) FROM customer WHERE c_nationkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
      |  UNION ALL SELECT 'orders', 'dup_pk',
      |    count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL SELECT 'orders', 'null_fk_cust',
      |    count(*) FILTER (o_custkey IS NULL) FROM orders
      |  UNION ALL SELECT 'orders', 'null_date',
      |    count(*) FILTER (o_orderdate IS NULL) FROM orders
      |  UNION ALL SELECT 'orders', 'nonfinite_price',
      |    count(*) FILTER (o_totalprice IS NOT NULL AND NOT isfinite(o_totalprice)) FROM orders
      |  UNION ALL SELECT 'orders', 'dangling_cust',
      |    count(*) FROM orders WHERE o_custkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |  UNION ALL SELECT 'lineitem', 'dup_pk',
      |    (SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
      |     WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)
      |  UNION ALL SELECT 'lineitem', 'nonfinite_price',
      |    count(*) FILTER (l_extendedprice IS NOT NULL AND NOT isfinite(l_extendedprice)) FROM lineitem
      |  UNION ALL SELECT 'lineitem', 'dangling_order',
      |    count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |  UNION ALL SELECT 'lineitem', 'dangling_part',
      |    count(*) FROM lineitem WHERE l_partkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
      |  UNION ALL SELECT 'lineitem', 'dangling_supp',
      |    count(*) FROM lineitem WHERE l_suppkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
      |  UNION ALL SELECT 'supplier', 'dup_pk',
      |    count(s_suppkey) - count(DISTINCT s_suppkey) FROM supplier
      |  UNION ALL SELECT 'supplier', 'null_fk_nation',
      |    count(*) FILTER (s_nationkey IS NULL) FROM supplier
      |  UNION ALL SELECT 'supplier', 'dangling_nation',
      |    count(*) FROM supplier WHERE s_nationkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = s_nationkey)
      |  UNION ALL SELECT 'part', 'dup_pk',
      |    count(p_partkey) - count(DISTINCT p_partkey) FROM part
      |  UNION ALL SELECT 'documents', 'dup_pk',
      |    count(doc_id) - count(DISTINCT doc_id) FROM documents
      |  UNION ALL SELECT 'documents', 'null_text',
      |    count(*) FILTER (text IS NULL) FROM documents
      |  UNION ALL SELECT 'documents', 'nchars_drift',
      |    count(*) FILTER (n_chars IS NOT NULL AND text IS NOT NULL
      |      AND n_chars <> length(text)) FROM documents
      |  UNION ALL SELECT 'embeddings', 'dup_pk',
      |    count(vec_id) - count(DISTINCT vec_id) FROM embeddings
      |  UNION ALL SELECT 'embeddings', 'nonfinite_component',
      |    count(*) FILTER (len(list_filter(embedding,
      |      x -> NOT isfinite(x::DOUBLE))) > 0) FROM embeddings
      |  UNION ALL SELECT 'embeddings', 'zero_vector',
      |    count(*) FILTER (len(embedding) > 0
      |      AND len(list_filter(embedding, x -> x IS NULL)) = 0
      |      AND list_sum(list_transform(embedding,
      |      x -> abs(x::DOUBLE))) = 0.0) FROM embeddings
      |  UNION ALL SELECT 'embeddings', 'ragged_dims',
      |    count(DISTINCT len(embedding)) - 1 FROM embeddings)
      |ORDER BY table_name, "check"""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_quality_audit" -> qualityAudit _,
    "q36_cdc_merge" -> cdcMerge _,
    "q17_region_rollup" -> regionRollup _,
    "q15_revenue_chain" -> revenueChain _,
    "q01_pricing_agg" -> pricingAgg _,
    "q02_join_agg" -> joinAgg _,
    "q03_latest_per_key" -> latestPerKey _,
    "q04_antijoin_incremental" -> antijoinIncremental _,
    "q05_semijoin" -> semijoin _,
    "q06_setdiff_audit" -> setdiffAudit _,
    "q07_dup_audit" -> dupAudit _,
    "q13_backfill_merge" -> backfillMerge _,
    "q14_date_normalize" -> dateNormalize _)

  val oracles: Map[String, String] = Map(
    "q39_quality_audit" -> qualityAuditSql,
    "q36_cdc_merge" -> cdcMergeSql,
    "q17_region_rollup" -> regionRollupSql,
    "q15_revenue_chain" -> revenueChainSql,
    "q01_pricing_agg" -> pricingAggSql,
    "q02_join_agg" -> joinAggSql,
    "q03_latest_per_key" -> latestPerKeySql,
    "q04_antijoin_incremental" -> antijoinIncrementalSql,
    "q05_semijoin" -> semijoinSql,
    "q06_setdiff_audit" -> setdiffAuditSql,
    "q07_dup_audit" -> dupAuditSql,
    "q13_backfill_merge" -> backfillMergeSql,
    "q14_date_normalize" -> dateNormalizeSql)
}
