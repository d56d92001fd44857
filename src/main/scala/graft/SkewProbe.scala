package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial skew probe (VERDICT r10 #1): the generated corpora are
  * benign, so the caps/salting/AQE claims the 100 TB grade rests on had
  * never been stressed with a pathological key. This main plants them
  * deliberately and measures what each guard actually does:
  *
  *  1. Documents with three hot masses (GenCorpus.generateSkewedDocs:
  *     one text verbatim-repeated as 10% of the corpus, one near-dup
  *     TEMPLATE family as 10%, one boilerplate SEGMENT opening 10% of
  *     docs) → d02 banding under both cap modes (drop vs star-link),
  *     d18b's exact-first pipeline, with dropped-bucket counters and
  *     per-class flag recall so silent unflagging is measurable, not
  *     assumed.
  *  2. Fact tables at sf1 scale with one customer holding 10% of all
  *     orders and one order holding 10% of all lineitems → q15's
  *     fact-fact join chain under AQE skew-split vs explicit salting,
  *     with row-parity asserts.
  *  3. The same hub customer through g02's projection → fan-cap
  *     counter proves the |fan|² expansion never materializes.
  *
  * Usage: runMain graft.SkewProbe [nBase] [hotPct] [sfDir] [mult]
  * Defaults: 50000 10 /root/testdata/sf0.1 10 (≈ sf1 fact scale).
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nBase = args.headOption.map(_.toLong).getOrElse(50000L)
    val hotPct = if (args.length > 1) args(1).toInt else 10
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val mult = if (args.length > 3) args(3).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    import spark.implicits._

    def timed[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"""{"probe":"$what","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    def isolate(keep: Seq[DataFrame]): Unit = {
      spark.catalog.clearCache()
      keep.foreach { df =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
      }
    }

    // ---------------------------------------------------------------
    // Section 1: hot document/segment/band mass through the dedup family
    // ---------------------------------------------------------------
    val hotN = nBase * hotPct / 100
    val docs = GenCorpus.generateSkewedDocs(spark, nBase, hotPct)
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    println(s"""{"probe":"skew_corpus","docs":$nDocs,"hot_per_class":$hotN}""")

    // Per-class count of docs that surface in at least one verified pair.
    def flaggedByClass(pairs: DataFrame): Map[String, Long] =
      pairs.select(explode(array($"doc_a", $"doc_b")).as("doc_id"))
        .distinct()
        .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
        .groupBy($"source").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // d02, production defaults (oversized buckets DROPPED, observable):
    // the hot masses blow every band bucket past the cap, so the honest
    // outcome is near-zero flag recall on hot_exact/hot_template — the
    // probe records it instead of letting the cap hide it.
    val pairsDrop = timed(s"d02_drop_n$nDocs") {
      val p = operators.Dedup.minhashPairs(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val flaggedDrop = flaggedByClass(pairsDrop)
    val dropped = operators.Dedup.minhashDroppedBuckets(docs)
      .agg(count(lit(1)).as("n"), coalesce(max($"bucket_n"), lit(0L)).as("mx"))
      .collect().head
    println(s"""{"probe":"d02_drop_recall","pairs":${pairsDrop.count()},"flagged":${jsonMap(flaggedDrop)},"dropped_buckets":${dropped.getAs[Long]("n")},"max_bucket_n":${dropped.getAs[Long]("mx")}}""")
    pairsDrop.unpersist()

    // d02 with oversized-link: every hot-bucket member stars against the
    // bucket representative — linear candidate volume, full hot recall.
    isolate(Seq(docs))
    val pairsStar = timed(s"d02_star_n$nDocs") {
      val p = operators.Dedup.minhashPairs(docs, oversizedLink = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val flaggedStar = flaggedByClass(pairsStar)
    println(s"""{"probe":"d02_star_recall","pairs":${pairsStar.count()},"flagged":${jsonMap(flaggedStar)},"hot_exact_total":$hotN,"hot_template_total":$hotN}""")
    pairsStar.unpersist()

    // d18b: exact-first segment near-dup. The verbatim hot doc mass and
    // the boilerplate segment mass must BOTH be flagged by the exact
    // stage (never reaching a bucket), and the near-dup stage runs over
    // keepers only, so the banding input stays de-skewed by construction.
    isolate(Seq(docs))
    val d18b = timed(s"d18b_skew_n$nDocs") {
      val r = operators.Dedup.segmentNeardupFullOf(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val byClass = d18b.join(docs.select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"source")
      .agg(count(lit(1)).as("docs"),
        sum(when($"n_fuzzy_dup" > 0, 1L).otherwise(0L)).as("docs_with_dup"),
        sum($"n_fuzzy_dup").as("dup_segs"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("docs"), r.getAs[Long]("docs_with_dup"), r.getAs[Long]("dup_segs")))
      .toMap
    for ((cls, (n, withDup, segs)) <- byClass.toSeq.sortBy(_._1)) {
      println(s"""{"probe":"d18b_skew_class","class":"$cls","docs":$n,"docs_with_dup":$withDup,"dup_segs":$segs}""")
    }
    d18b.unpersist()
    docs.unpersist()

    // ---------------------------------------------------------------
    // Section 2: fact-fact join skew (q15) — one customer with 10% of
    // orders, one order with 10% of lineitems, at ×mult (≈ sf1) scale.
    // ---------------------------------------------------------------
    val o1 = Tables.orders(spark, sfDir)
    val li1 = Tables.lineitem(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    val reg = Tables.region(spark, sfDir)
    val hotCk = cust.select(min($"c_custkey")).as[Long].head()
    val hotOk = o1.select(min($"o_orderkey")).as[Long].head()

    def repl(df: DataFrame, keys: Seq[String]): DataFrame =
      (0 until mult).map { i =>
        keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i.toLong * 100000000L)))
      }.reduce(_ unionByName _)

    val oFlat = repl(o1, Seq("o_orderkey"))
    val liFlat = repl(li1, Seq("l_orderkey"))
    // hot customer: 10% of ALL orders reassigned to one custkey;
    // hot order: 10% of ALL lineitems reassigned to one orderkey.
    val oSkew = oFlat.withColumn("o_custkey",
        when(pmod(xxhash64($"o_orderkey"), lit(100)) < hotPct, lit(hotCk))
          .otherwise($"o_custkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val liSkew = liFlat.withColumn("l_orderkey",
        when(pmod(xxhash64($"l_orderkey", $"l_suppkey"), lit(100)) < hotPct,
          lit(hotOk)).otherwise($"l_orderkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nO = oSkew.count()
    val nLi = liSkew.count()
    println(s"""{"probe":"skew_facts","orders":$nO,"lineitems":$nLi,"hot_custkey_orders":${oSkew.filter($"o_custkey" === hotCk).count()},"hot_orderkey_lineitems":${liSkew.filter($"l_orderkey" === hotOk).count()}}""")

    // 100 TB shape: no dim auto-broadcast (customer does not fit in one
    // executor at scale); AQE skew thresholds scaled to probe data size
    // the way a cluster tunes them to partition size.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    def runChain(li: DataFrame, o: DataFrame, what: String): (Seq[org.apache.spark.sql.Row], Boolean) = {
      var plan = ""
      val rows = timed(what) {
        val df = pipeline.Relational.revenueChainOf(li, o, cust, nat, reg)
        val r = df.collect().toSeq
        plan = df.queryExecution.executedPlan.toString
        r
      }
      (rows, plan.contains("skew=true"))
    }

    val (rowsFlat, _) = runChain(liFlat, oFlat, s"q15_unskewed_x$mult")
    val (rowsSkew, skewSplit) = runChain(liSkew, oSkew, s"q15_hotkeys_x$mult")
    println(s"""{"probe":"q15_aqe_skew_split","applied":$skewSplit,"rows_unskewed":${rowsFlat.size},"rows_skewed":${rowsSkew.size}}""")

    // Explicit salting as the AQE-independent fallback: the hot-customer
    // join runs through SkewJoin.saltedJoin (orders salted 32 ways on
    // o_orderkey, customer replicated), rest of the chain unchanged —
    // must be row-identical to the plain skewed run.
    val rowsSalted = timed(s"q15_salted_x$mult") {
      val custR = cust.withColumnRenamed("c_custkey", "o_custkey")
      val oc = operators.SkewJoin.saltedJoin(
        oSkew, custR, "o_custkey", "o_orderkey", n = 32)
      liSkew.join(oc, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy($"n_name")
        .collect().toSeq
    }
    // Parity modulo summation order: the salted plan reduces the same
    // multiset in a different order, so the double sum can differ in the
    // last bits and flip a cents-rounding. Compare revenue within one
    // rounding ulp (0.01) and lineitem counts exactly.
    val saltedBy = rowsSalted.map(r =>
      r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val skewBy = rowsSkew.map(r =>
      r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val sameKeys = saltedBy.keySet == skewBy.keySet
    val maxRevDelta =
      if (!sameKeys) Double.MaxValue
      else if (skewBy.isEmpty) 0.0
      else skewBy.map { case (k, (rev, _)) =>
        math.abs(rev - saltedBy(k)._1) }.max
    val countsEqual = sameKeys && skewBy.forall { case (k, (_, n)) =>
      saltedBy(k)._2 == n }
    println(f"""{"probe":"q15_salted_parity","keys_equal":$sameKeys,"counts_equal":$countsEqual,"max_rev_delta":$maxRevDelta%.4f}""")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)

    // ---------------------------------------------------------------
    // Section 3: g02 through the hub customer — fan cap counter.
    // ---------------------------------------------------------------
    val pairsSkew = oSkew.join(liSkew, $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("ck"), $"l_suppkey".as("sk")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairsSkew.count()
    val excluded = operators.Graph.fanExcluded(pairsSkew).collect()
    val hubRow = excluded.find(_.getAs[Long]("ck") == hotCk)
    val g02 = timed(s"g02_hub_x$mult") {
      operators.Graph.copurchaseOf(pairsSkew).count()
    }
    println(s"""{"probe":"g02_fan_cap","excluded_customers":${excluded.length},"hub_fan":${hubRow.map(_.getAs[Long]("fan")).getOrElse(-1L)},"top_rows":$g02}""")

    oSkew.unpersist(); liSkew.unpersist(); pairsSkew.unpersist()
    spark.stop()
  }

  private def jsonMap(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
}
