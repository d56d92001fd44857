package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Ingest-boundary type hygiene: real lakes mix TIMESTAMP(LTZ), TIMESTAMP_NTZ,
  * and TIMESTAMP(NANOS) parquet freely, and the round-9 testdata regeneration
  * proved it — `events.ts` flipped from nanos-as-long to NTZ and broke every
  * `unix_micros` consumer. This spec pins the contract: `Tables.events`
  * yields an identical TimestampType frame no matter which of the three
  * encodings the producer chose, and the three operators that broke (e02
  * sessionize, e04 as-of join, e11 EWMA) return bit-identical results on all
  * of them.
  */
class EventsTypeToleranceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft_tstol_").toString

  /** Canonical frame via the production loader (already TimestampType). */
  private lazy val canonical: DataFrame = Tables.events(spark, sf).cache()

  private lazy val variantDirs: Map[String, String] = {
    val ltzDir = s"$tmp/ltz"
    val ntzDir = s"$tmp/ntz"
    val nanosDir = s"$tmp/nanos"
    // TIMESTAMP (LTZ): Spark's default parquet encoding for TimestampType.
    canonical.write.mode("overwrite").parquet(s"$ltzDir/events.parquet")
    // TIMESTAMP_NTZ: same micros as wall-clock fields, no zone — what the
    // regenerated driver testdata actually contains.
    canonical.withColumn("ts", $"ts".cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    // nanos-as-long: INT64 nanoseconds since epoch, the shape Spark produces
    // for TIMESTAMP(NANOS) parquet under legacy.parquet.nanosAsLong=true.
    canonical.withColumn("ts", unix_micros($"ts") * lit(1000L))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    Map("ltz" -> ltzDir, "ntz" -> ntzDir, "nanos" -> nanosDir)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("loader normalizes all three parquet timestamp encodings to TimestampType") {
    val base = sortedRows(canonical)
    for ((name, dir) <- variantDirs) {
      val loaded = Tables.events(spark, dir)
      assert(loaded.schema("ts").dataType == TimestampType,
        s"variant $name: ts should load as TimestampType")
      assert(sortedRows(loaded) == base, s"variant $name: rows differ")
    }
  }

  test("raw NTZ read really is NTZ (the normalization is doing work)") {
    val raw = spark.read.parquet(s"${variantDirs("ntz")}/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
  }

  test("orders/lineitem timestamp columns normalize under the same contract") {
    for ((table, tsCol, loader) <- Seq(
        ("orders", "o_orderdate",
          (d: String) => Tables.orders(spark, d)),
        ("lineitem", "l_shipdate",
          (d: String) => Tables.lineitem(spark, d)))) {
      val canon = loader(sf).cache()
      assert(canon.schema(tsCol).dataType == TimestampType)
      val base = sortedRows(canon)
      val vDir = s"$tmp/$table"
      canon.withColumn(tsCol, col(tsCol).cast(TimestampNTZType))
        .write.mode("overwrite").parquet(s"$vDir/ntz/$table.parquet")
      canon.withColumn(tsCol, unix_micros(col(tsCol)) * lit(1000L))
        .write.mode("overwrite").parquet(s"$vDir/nanos/$table.parquet")
      for (enc <- Seq("ntz", "nanos")) {
        val loaded = loader(s"$vDir/$enc")
        assert(loaded.schema(tsCol).dataType == TimestampType,
          s"$table/$enc: $tsCol should load as TimestampType")
        assert(sortedRows(loaded) == base, s"$table/$enc: rows differ")
      }
      canon.unpersist()
    }
  }

  test("INT64 timestamp unit is disambiguated by magnitude (s/ms/us/ns)") {
    // A plain INT64 ts column carries no unit; the loader decodes it by
    // magnitude (thresholds at 1e10/1e13/1e16 — disjoint decades for any
    // instant between 1970-04-26 and ~2286). Whole-second instants
    // round-trip exactly through all four encodings, so all four must
    // load bit-identical to the TimestampType original.
    val wsDir = s"$tmp/wholesec"
    val whole = canonical.withColumn("ts", timestamp_seconds(unix_seconds($"ts")))
    whole.write.mode("overwrite").parquet(s"$wsDir/canon/events.parquet")
    val units = Seq("sec" -> 1L, "ms" -> 1000L, "us" -> 1000000L,
      "ns" -> 1000000000L)
    for ((unit, mult) <- units) {
      whole.withColumn("ts", unix_seconds($"ts") * lit(mult))
        .write.mode("overwrite").parquet(s"$wsDir/$unit/events.parquet")
    }
    val base = sortedRows(Tables.events(spark, s"$wsDir/canon"))
    for ((unit, _) <- units) {
      val loaded = Tables.events(spark, s"$wsDir/$unit")
      assert(loaded.schema("ts").dataType == TimestampType,
        s"unit $unit: ts should load as TimestampType")
      assert(sortedRows(loaded) == base, s"unit $unit: rows differ")
    }
  }

  test("e02/e04/e11 produce identical results on every encoding") {
    val ops: Seq[(String, String => DataFrame)] = Seq(
      "e02_sessionize" -> (d => pipeline.Events.sessionize(spark, d)),
      "e04_asof_join" -> (d => pipeline.Events.asof(spark, d)),
      "e11_ewma_stats" -> (d => pipeline.Events.ewmaTypeStats(spark, d)))
    for ((opName, op) <- ops) {
      val base = sortedRows(op(sf))
      assert(base.nonEmpty, s"$opName: empty baseline result")
      for ((vName, dir) <- variantDirs) {
        assert(sortedRows(op(dir)) == base, s"$opName on $vName differs")
      }
    }
  }

  test("loader nulls non-finite measurements but keeps their rows") {
    // The finite-value half of the events LOAD CONTRACT (see
    // Tables.events): a NaN poisons every SUM/AVG, an Inf squares past
    // double range inside any variance (DuckDB raises out-of-range where
    // Spark saturates to NaN), so the measure is nulled at ingest — but
    // the EVENT still happened, so the row survives for counts/windows.
    val dir = s"$tmp/nonfinite"
    val t0 = java.sql.Timestamp.valueOf("2026-01-05 13:00:00")
    Seq(
      (1L, Option(t0), Option(1L), Option("click"), Option(1.5), Option("{}")),
      (2L, Option(t0), Option(1L), Option("click"), Option(Double.NaN), Option("{}")),
      (3L, Option(t0), Option(1L), Option("click"), Option(Double.PositiveInfinity), Option("{}")),
      (4L, Option(t0), Option(1L), Option("click"), Option(Double.NegativeInfinity), Option("{}")),
      (5L, Option(t0), Option(1L), Option("click"), Option.empty[Double], Option("{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
      .select($"event_id", $"value").as[(Long, Option[Double])]
      .collect().toMap
    assert(got.size == 5, s"all five rows must survive: $got")
    assert(got(1L).contains(1.5), s"finite value untouched: $got")
    assert(Seq(2L, 3L, 4L, 5L).forall(got(_).isEmpty),
      s"NaN/+Inf/-Inf/NULL all read back as NULL: $got")
  }
}
