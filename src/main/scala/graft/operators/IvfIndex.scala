package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor (SURVEY.md §2 s04).
  *
  * Classic two-level ANN: k-means-style coarse quantizer (few Lloyd
  * iterations, centroid state lives on the driver exactly as MLlib keeps
  * model state — K×dim doubles, kilobytes), then search probes only the
  * `nprobe` nearest clusters and exactly re-ranks their members.
  *
  * Scale shape: assignment is a map-only pass against broadcast centroids
  * (one small crossJoin + per-row argmax); the index is the cluster-id
  * column, which at 100 TB becomes the partition/bucket key so a probe
  * reads only matching partitions. Training touches the corpus t times;
  * search reads ~nprobe/K of it.
  */
object IvfIndex {

  /** Lloyd iterations over cosine similarity; returns (cluster_id, centroid)
    * rows. Deterministic: seeds are the first K vectors by id.
    */
  def train(vectors: DataFrame, k: Int = 16, iters: Int = 3): Seq[(Int, Seq[Double])] = {
    val s = vectors.sparkSession
    import s.implicits._
    val v = vectors.select($"vec_id", asDouble($"embedding").as("v"))

    var centroids: Seq[(Int, Seq[Double])] = v.orderBy($"vec_id").limit(k)
      .select($"v").as[Seq[Double]].collect().toSeq.zipWithIndex.map(_.swap)

    for (_ <- 1 to iters) {
      // Map-only assignment: NearestCentroid evaluates the argmax against
      // the plan-literal centroid matrix in one tight loop per row — no
      // crossJoin(K), no window, no shuffle of K copies of every vector.
      val assigned = v.select(
        org.apache.spark.sql.graft.GraftFunctions
          .nearest_centroid($"v", centroids).as("cluster_id"),
        $"v")
      // new centroid = vector mean via the typed VectorMean aggregator:
      // partial state is ONE dim-length array per (partition, cluster),
      // not the (rows × dim) exploded shape — the shuffle carries
      // K × partitions small arrays at any corpus size.
      val vecMean = udaf(new graft.functions.TypedAggregators.VectorMean,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
      centroids = assigned
        .groupBy($"cluster_id")
        .agg(vecMean($"v").as("centroid"))
        .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    }
    centroids
  }

  /** Assign every vector to its nearest centroid — the IVF index column.
    * Map-only (see train): the centroid matrix rides in the expression.
    */
  def assign(vectors: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    vectors.select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("cluster_id",
        org.apache.spark.sql.graft.GraftFunctions.nearest_centroid($"v", centroids))
  }

  /** s04: IVF top-k — probe the nprobe nearest clusters per query, exact
    * cosine re-rank of only those members.
    */
  def knnIvf(s: SparkSession, dir: String,
      queryBound: Int = 32, k: Int = 5, clusters: Int = 16,
      nprobe: Int = 4, iters: Int = 2): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val centroids = train(emb, clusters, iters)
    val indexed = assign(emb, centroids)

    val queries = indexed.filter($"vec_id" < queryBound)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val cDf = s.createDataFrame(centroids).toDF("cluster_id", "centroid")
    val wProbe = Window.partitionBy($"query_id").orderBy($"csim".desc, $"cluster_id")
    val probes = queries.crossJoin(broadcast(cDf))
      .withColumn("csim", cosine($"qv", $"centroid"))
      .withColumn("rn", row_number().over(wProbe))
      .filter($"rn" <= nprobe)
      .select($"query_id", $"qv", $"cluster_id")

    val members = indexed.select($"cluster_id",
      $"vec_id".as("neighbor_id"), $"v".as("nv"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    probes.join(members, Seq("cluster_id"))
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("cos", cosine($"qv", $"nv"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", round($"cos", 6).as("sim"))
      .orderBy($"query_id", $"rank")
  }

  /** Persist the IVF index for query-time serving — the production form
    * of s04, where training is an OFFLINE job and queries arrive later:
    * a kilobyte centroid table plus the member table hive-partitioned by
    * `cluster_id`, so a probe's equi-join on the partition column lets
    * Spark's dynamic partition pruning read only the `nprobe` probed
    * directories per query batch (the scan carries a
    * `dynamicpruningexpression` PartitionFilter — asserted in the spec)
    * instead of the corpus. Reference point: s04's in-query form
    * retrains per call; this store amortizes training across every
    * future query batch AND every future delta append.
    */
  def writeIndex(vectors: DataFrame, path: String, clusters: Int = 16,
      iters: Int = 3): Unit = {
    val s = vectors.sparkSession
    val centroids = train(vectors, clusters, iters)
    s.createDataFrame(centroids).toDF("cluster_id", "centroid")
      .coalesce(1) // K rows of kilobytes — one file IS the right layout
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path + "/centroids")
    assign(vectors, centroids)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cluster_id").parquet(path + "/members")
  }

  private def readCentroids(s: SparkSession,
      path: String): Seq[(Int, Seq[Double])] = {
    import s.implicits._
    s.read.parquet(path + "/centroids")
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
  }

  /** Append new vectors to a stored index WITHOUT retraining: assign
    * against the stored centroids (map-only) and append into the
    * partitioned layout — the d14 incremental story for embeddings (a
    * daily embedding batch costs one delta-sized pass, and is
    * immediately searchable). Centroid drift is a rebuild decision, not
    * an append-time cost; the spec plants a near-copy post-append and
    * finds it at rank 1.
    */
  def appendVectors(s: SparkSession, path: String,
      newVectors: DataFrame): Unit =
    assign(newVectors, readCentroids(s, path))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cluster_id").parquet(path + "/members")

  /** Top-k search against a stored index: route each query to its
    * `nprobe` nearest stored centroids (broadcast K-row table), then
    * equi-join the member partitions and exactly re-rank. `queries` is
    * (query_id, qv: array<double>).
    */
  def searchIndex(s: SparkSession, path: String, queries: DataFrame,
      k: Int = 5, nprobe: Int = 4): DataFrame = {
    import s.implicits._
    val cDf = s.createDataFrame(readCentroids(s, path))
      .toDF("cluster_id", "centroid")
    val wProbe = Window.partitionBy($"query_id").orderBy($"csim".desc, $"cluster_id")
    val probes = queries.crossJoin(broadcast(cDf))
      .withColumn("csim", cosine($"qv", $"centroid"))
      .withColumn("rn", row_number().over(wProbe))
      .filter($"rn" <= nprobe)
      .select($"query_id", $"qv", $"cluster_id")
    val members = s.read.parquet(path + "/members")
      .select($"cluster_id", $"vec_id".as("neighbor_id"), $"v".as("nv"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    probes.join(members, Seq("cluster_id"))
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("cos", cosine($"qv", $"nv"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", round($"cos", 6).as("sim"))
      .orderBy($"query_id", $"rank")
  }
}
