package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Semantic checks for the round-2 analytics operators on crafted inputs
  * (the DuckDB gate checks them on the test tables; these pin the edge
  * cases the gate's data may not exercise).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("range join: inclusive start, exclusive end, multi-interval overlap") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == start of iv A: in
      (2L, ts("2024-01-03 23:59:59")), // inside A: in
      (3L, ts("2024-01-04 00:00:00")), // == end of A: out
      (4L, ts("2024-01-02 12:00:00")), // inside A and overlapping B
      (5L, ts("2023-12-31 23:59:59"))  // before all: out
    ).toDF("id", "ts")
    val ivs = Seq(
      ("A", ts("2024-01-01 00:00:00"), ts("2024-01-04 00:00:00")),
      ("B", ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"))
    ).toDF("iv", "start_ts", "end_ts")
    val got = RangeJoin.pointInInterval(points, "ts", ivs, "start_ts", "end_ts")
      .select($"id", $"iv").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "A"), (2L, "A"), (4L, "A"), (4L, "B")))
  }

  test("funnel counts only strictly-ordered stage progressions") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: click BEFORE view, purchase after — only stage 1 counts
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:00"), "purchase"),
      // user 3: view then click, no purchase
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
      .withColumn("event_id", $"user_id")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = pipeline.Analytics.funnel(spark, dir).head()
    assert(row.getLong(0) == 3L, "n_view")              // users 1,2,3 viewed
    assert(row.getLong(1) == 2L, "n_view_click")        // users 1,3 clicked after view
    assert(row.getLong(2) == 1L, "n_view_click_purchase") // only user 1
  }

  test("retention: day with full churn reports 0") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")), // only user 1 returns on day 2
      (3L, ts("2024-01-03 10:00:00"))  // day 2 -> 3: nobody returns
    ).toDF("user_id", "ts")
      .withColumn("event_id", $"user_id").withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ret_").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = pipeline.Analytics.retention(spark, dir)
      .select($"day".cast("string"), $"n_active", $"n_retained")
      .as[(String, Long, Long)].collect()
    assert(rows.toSeq == Seq(
      ("2024-01-01", 2L, 1L), ("2024-01-02", 1L, 0L), ("2024-01-03", 1L, 0L)))
  }

  test("winnow fingerprints: shorter-than-window doc yields one fingerprint") {
    import org.apache.spark.sql.graft.GraftFunctions
    val df = Seq("a b c").toDF("text")
      .select(GraftFunctions.winnow_fingerprints(
        graft.operators.Dedup.shingles($"text", 3), 4).as("fp"))
    assert(df.select(size($"fp")).head().getInt(0) == 1)
  }

  test("e12 MAD outliers: zero-MAD groups are excluded, heavy tails flagged") {
    import spark.implicits._
    // "flat": >50% identical values -> MAD 0 -> the group must be skipped
    // entirely (no division blow-up), even though 99.0 is a wild outlier
    // by the mean/stddev yardstick. "spread": median 5.5, MAD 2.5 -> only
    // the 1000.0 event crosses the 3.5 modified-z cut.
    val ev = (Seq((1L, "flat", 5.0), (2L, "flat", 5.0), (3L, "flat", 5.0),
      (4L, "flat", 99.0)) ++
      (1 to 9).map(i => (10L + i, "spread", i.toDouble)) :+ (20L, "spread", 1000.0))
      .toDF("event_id", "event_type", "value")
    val got = pipeline.Events.madOutliersOf(ev, 3.5)
      .select($"event_id", $"event_type").as[(Long, String)].collect().toSeq
    assert(got == Seq((20L, "spread")), got.toString)
  }

  test("e13 seasonal baseline: spiked hour flagged, absent hour gap-filled, " +
      "flat profile yields z=0") {
    import spark.implicits._
    // "spiky": 10 events at 03h, 1 at every other hour EXCEPT 07h (absent
    // -> must gap-fill to a zero bin, not vanish). "flat": identical
    // volume every hour -> sd = 0 -> z pinned to 0, nothing flagged.
    val ev = ((1 to 10).map(i => (f"2024-01-0${i % 9 + 1} 03:${10 + i}%02d:00", "spiky")) ++
      (0 to 23).filter(h => h != 3 && h != 7)
        .map(h => (f"2024-01-01 $h%02d:30:00", "spiky")) ++
      (0 to 23).flatMap(h => Seq(
        (f"2024-01-01 $h%02d:00:00", "flat"), (f"2024-01-02 $h%02d:05:00", "flat"))))
      .map { case (t, ty) => (ts(t), ty) }.toDF("ts", "event_type")
    val out = pipeline.Events.seasonalBaselineOf(ev, 2.0).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(4), r.getBoolean(5))).toMap
    assert(out.size == 48, s"expected 2 types x 24 hours, got ${out.size}")
    val (n3, z3, a3) = out(("spiky", 3))
    assert(n3 == 10L && z3 > 2.0 && a3, s"spike bin: $n3 $z3 $a3")
    val (n7, z7, a7) = out(("spiky", 7))
    assert(n7 == 0L && z7 < 0 && !a7, s"gap bin: $n7 $z7 $a7")
    assert((0 to 23).forall(h => out(("flat", h)) == ((2L, 0.0, false))),
      "flat profile must pin z to 0 with no flags")
  }

  test("e14 cusum: a sustained level shift accumulates to a flag on both " +
      "tails, a stable series never flags") {
    import spark.implicits._
    // "shift": 10/day for days 1-10 then 30/day for days 11-20 — vs the
    // global mean both segments drift steadily (|z| ≈ 0.97 per day, under
    // any single-point cut) and only ACCUMULATION crosses h=4: the low
    // tail via s_neg around day 9, the high tail via s_pos around day 19,
    // with the transition days in between unflagged. "stable": constant
    // volume, sd=0, z pinned to 0 → CUSUM never moves.
    val ev = ((1 to 20).flatMap { d =>
      val per = if (d <= 10) 10 else 30
      (1 to per).map(i => (ts(f"2024-03-$d%02d ${i % 24}%02d:01:00"), "shift"))
    } ++ (1 to 20).flatMap { d =>
      (1 to 5).map(i => (ts(f"2024-03-$d%02d ${i % 24}%02d:02:00"), "stable"))
    }).toDF("ts", "event_type")
    val rows = pipeline.Events.cusumChangepointOf(ev).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(rows.size == 40, s"expected 2 types x 20 days, got ${rows.size}")
    assert((1 to 20).forall(d => !rows(("stable", f"2024-03-$d%02d"))._4),
      "stable series must never flag")
    val (_, _, sneg9, f9) = rows(("shift", "2024-03-09"))
    assert(f9 && sneg9 > 4.0, s"low tail must flag via s_neg by day 9: $sneg9")
    val (_, spos19, _, f19) = rows(("shift", "2024-03-19"))
    assert(f19 && spos19 > 4.0, s"high tail must flag via s_pos by day 19: $spos19")
    val (_, spos11, sneg11, f11) = rows(("shift", "2024-03-11"))
    assert(!f11 && spos11 < 4.0 && sneg11 < 4.0,
      s"transition day must not flag: $spos11 $sneg11")
  }

  test("window NULL-ordering contracts: undated/unpriced rows take their " +
    "pinned rank positions (q03/q23/q27/q29/q31)") {
    // The GenAdversarial relational gate found q29 diverging cross-engine
    // on Spark's NULLS-FIRST vs DuckDB's NULLS-LAST ascending default;
    // every window over a nullable key now pins placement explicitly.
    // This test pins the CONTRACT engine-independently: unknown dates
    // are presumed-oldest and never "latest"/"current"; unknown
    // spend/revenue ranks lowest.
    val dir = java.nio.file.Files.createTempDirectory("graft_nullord_").toString
    val d1 = ts("2024-01-01 00:00:00"); val d2 = ts("2024-02-01 00:00:00")
    Seq(
      (10L, 1L, "O", Option(100.0), Option(d1), "1-URGENT"),
      (11L, 1L, "O", Option(200.0), Option(d2), "2-HIGH"),
      (13L, 1L, "F", Option(50.0), Option.empty[Timestamp], "3-MEDIUM"),
      (12L, 2L, "O", Option.empty[Double], Option(d1), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "cust-normal", 3, 10.0, "BUILDING"),
      (2L, "cust-null-spend", 3, 20.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "part-priced", "Brand#1", "T", 5, 10.0),
      (2L, "part-null-rev", "Brand#1", "T", 5, 11.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((100L, 1L, 1, 1, 5.0, Option(500.0), 0.1, 0.02, "N", "O", d1),
      (101L, 2L, 1, 1, 5.0, Option.empty[Double], 0.1, 0.02, "N", "O", d1))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // q03: the undated order (key 13) must never win "latest"
    val latest = pipeline.Relational.latestPerKey(spark, dir)
      .select($"o_custkey", $"o_orderkey").as[(Long, Long)].collect().toMap
    assert(latest(1L) == 11L, s"undated order must not be latest: $latest")

    // q29: the undated order chains FIRST (presumed-oldest), never current
    val scd = pipeline.Analytics.scd2Intervals(spark, dir)
      .filter($"o_custkey" === 1L)
      .select($"o_orderkey", $"valid_from".isNull, $"is_current")
      .as[(Long, Boolean, Boolean)].collect()
    val byKey = scd.map(r => r._1 -> r).toMap
    assert(byKey(13L)._2 && !byKey(13L)._3,
      s"undated row must have NULL valid_from and never be current: ${scd.toSeq}")
    assert(byKey(11L)._3, s"last dated row must be current: ${scd.toSeq}")

    // q31: NULL spend ranks LOWEST (pct_rank 0 within the nation)
    val pr = pipeline.Analytics.percentRank(spark, dir)
      .select($"o_custkey", $"pct_rank").as[(Long, Double)].collect().toMap
    assert(pr(2L) < pr(1L) && pr(2L) < 1e-6,
      s"NULL spend must rank lowest: $pr")

    // q27: NULL spend segments into the BOTTOM quartile (desc window)
    val qt = pipeline.Analytics.ntileSegments(spark, dir)
      .select($"quartile", $"n_customers").as[(Int, Long)].collect().toMap
    assert(qt.keys.max == 2 && qt(1) == 1L && qt(2) == 1L,
      s"two customers split 1/1 with NULL spend in the bottom tile: $qt")

    // q23: NULL revenue never outranks known revenue
    val topk = pipeline.Analytics.topkRank(spark, dir)
      .select($"p_partkey", $"rnk").as[(Long, Int)].collect().toMap
    assert(topk(1L) == 1 && topk(2L) == 2,
      s"NULL revenue must rank below priced part: $topk")
  }

  test("q39 quality audit: planted violations counted exactly, clean " +
    "checks report zero") {
    val dir = java.nio.file.Files.createTempDirectory("graft_audit_").toString
    val d = ts("2024-03-01 00:00:00")
    Seq((0, "R0")).toDF("n_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((0, "N0", 0), (1, "N1", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq( // dup custkey 5 (1 excess), nationkey 9 dangling, one NULL fk, one NaN bal
      (5L, "a", Option(0), Option(10.0), "SEG"),
      (5L, "b", Option(0), Option(11.0), "SEG"),
      (6L, "c", Option(9), Option(12.0), "SEG"),
      (7L, "d", Option.empty[Int], Option(13.0), "SEG"),
      (8L, "e", Option(1), Option(Double.NaN), "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "s", Option(1), 5.0), (2L, "t", Option(3), 6.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((10L, "p", "B", "T", 1, 9.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq( // dup orderkey 100, one dangling custkey 99, one NULL date, one -Inf price
      (100L, Option(5L), "O", Option(50.0), Option(d), "1-URGENT"),
      (100L, Option(5L), "O", Option(51.0), Option(d), "1-URGENT"),
      (101L, Option(99L), "O", Option(52.0), Option(d), "1-URGENT"),
      (102L, Option(6L), "O", Option(Double.NegativeInfinity), Option.empty[Timestamp], "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq( // dup (400,1), dangling order 999 / part 88 / supplier 77
      (400L, Option(10L), Option(1), Option(1), 1.0, Option(10.0), 0.0, 0.0, "N", "O", d),
      (400L, Option(10L), Option(1), Option(1), 2.0, Option(11.0), 0.0, 0.0, "N", "O", d),
      (999L, Option(10L), Option(1), Option(2), 3.0, Option(12.0), 0.0, 0.0, "N", "O", d),
      (100L, Option(88L), Option(1), Option(3), 4.0, Option(13.0), 0.0, 0.0, "N", "O", d),
      (100L, Option(10L), Option(77), Option(4), 5.0, Option(Double.NaN), 0.0, 0.0, "N", "O", d))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    Seq( // dup doc_id 20, one NULL text, one n_chars drifted from text
      (20L, Option("alpha beta"), "en", "s", Option(10L)),
      (20L, Option("gamma delta"), "en", "s", Option(11L)),
      (21L, Option.empty[String], "en", "s", Option.empty[Long]),
      (22L, Option("epsilon"), "en", "s", Option(999L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq( // dup vec_id 30, a NaN component, a zero vector, ragged dims,
         // plus the NULL and EMPTY vectors the hardened checks must not
         // misread (size(NULL) = -1 under non-ANSI; aggregate([]) = seed)
      (30L, Option(Seq(1.0f, 2.0f, 3.0f, 4.0f)), 0),
      (30L, Option(Seq(1.0f, 2.0f, 3.0f, 5.0f)), 0),
      (31L, Option(Seq(Float.NaN, 1.0f, 1.0f, 1.0f)), 0),
      (32L, Option(Seq(0.0f, 0.0f, 0.0f, 0.0f)), 0),
      (33L, Option(Seq(1.0f, 2.0f)), 0),
      (34L, Option.empty[Seq[Float]], 0),
      (35L, Option(Seq.empty[Float]), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = pipeline.Relational.qualityAudit(spark, dir)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val expected = Map(
      ("customer", "dup_pk") -> 1L, ("customer", "dangling_nation") -> 1L,
      ("customer", "null_fk_nation") -> 1L, ("customer", "nonfinite_acctbal") -> 1L,
      ("orders", "dup_pk") -> 1L, ("orders", "dangling_cust") -> 1L,
      ("orders", "null_date") -> 1L, ("orders", "nonfinite_price") -> 1L,
      ("orders", "null_fk_cust") -> 0L,
      // dangling orders: both 400-rows and the 999-row (orders has
      // only 100/101/102)
      ("lineitem", "dup_pk") -> 1L, ("lineitem", "dangling_order") -> 3L,
      ("lineitem", "dangling_part") -> 1L, ("lineitem", "dangling_supp") -> 1L,
      ("lineitem", "nonfinite_price") -> 1L,
      ("supplier", "dup_pk") -> 0L, ("supplier", "dangling_nation") -> 1L,
      ("supplier", "null_fk_nation") -> 0L,
      ("part", "dup_pk") -> 0L,
      ("documents", "dup_pk") -> 1L, ("documents", "null_text") -> 1L,
      ("documents", "nchars_drift") -> 1L,
      ("embeddings", "dup_pk") -> 1L,
      ("embeddings", "nonfinite_component") -> 1L,
      // zero_vector excludes the EMPTY vector (non-empty guard); the
      // NULL vector is invisible to ragged_dims while the empty one is
      // a real distinct dimension: dims {4, 2, 0} -> 2 excess
      ("embeddings", "zero_vector") -> 1L,
      ("embeddings", "ragged_dims") -> 2L)
    assert(got == expected,
      s"mismatches: ${(got.toSet diff expected.toSet)} / ${(expected.toSet diff got.toSet)}")
  }
}
