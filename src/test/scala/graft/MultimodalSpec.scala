package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Binary-column plumbing: schema, determinism, partition-batch shape. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table exposes binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val sch = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("payload") == "binary")
    assert(sch("n_bytes") == "bigint")
    assert(m.count() > 0)
  }

  test("decode features is deterministic and complete") {
    val a = Multimodal.decodeFeatures(spark, sf).collect()
    val b = Multimodal.decodeFeatures(spark, sf).collect()
    assert(a.sameElements(b), "stub decode must be deterministic")
    assert(a.length == Tables.documents(spark, sf).count())
    assert(a.forall(r => r.getAs[Int]("width") >= 64 &&
      r.getAs[Double]("mean_luma") >= 0 && r.getAs[Double]("mean_luma") <= 1))
  }

  test("resize plan preserves aspect ratio and never upscales") {
    val f = Multimodal.decodeFeatures(spark, sf)
    val r = Multimodal.resizePlan(f, 256, 256).collect()
    r.foreach { row =>
      val (w, h) = (row.getAs[Int]("width"), row.getAs[Int]("height"))
      val (ow, oh) = (row.getAs[Int]("out_w"), row.getAs[Int]("out_h"))
      assert(ow <= 256 && oh <= 256 && ow >= 1 && oh >= 1)
      assert(ow <= w && oh <= h, "no upscaling")
      // aspect preserved within integer-floor tolerance
      assert(math.abs(ow.toDouble / w - oh.toDouble / h) < 0.05)
    }
  }

  test("frame sample plan explodes work units per frame stride") {
    val f = Multimodal.decodeFeatures(spark, sf)
    val plan = Multimodal.frameSamplePlan(f, everyN = 2)
    val expected = f.select(sum(ceil($"n_frames" / 2.0))).as[Long].head()
    assert(plan.count() == expected)
  }
}
