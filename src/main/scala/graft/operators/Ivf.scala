package graft.operators

import graft.functions.Distances
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SPANN-style IVF index as DataFrames — the reference's scale-out ANN
  * design (`rust/index/src/spann/types.rs`: centroid graph + posting lists
  * in blockfiles; config `rust/types/src/spann_configuration.rs:102-145`)
  * re-expressed Spark-first per SURVEY §1.5: k-means centroids
  * (`ml.clustering.KMeans`, the natural batch analogue of SPANN's
  * incremental k-means splits) + a posting-list table partitioned by
  * centroid.
  *
  * Query routing (`search_nprobe`): nearest `nprobe` centroids per query
  * (tiny broadcast join), then a join against only those posting lists —
  * at scale the postings table is partitioned/bucketed by `centroid_id`,
  * so the probe reads `nprobe/nCentroids` of the data instead of all of
  * it. Recall is gated in IvfSpec (>= 0.95 @ k=10, mirroring
  * `chromadb/test/property/invariants.py:281`).
  */
object Ivf {

  /** centroids: (centroid_id INT, centroid ARRAY<FLOAT>);
    * postings: (centroid_id INT, offset_id LONG, embedding ARRAY<FLOAT>).
    */
  final case class Model(centroids: DataFrame, postings: DataFrame)

  /** Batch index build = the compaction job's index-writer phase
    * (SURVEY §3.4). Deterministic for a fixed seed.
    *
    * `nReplica` multi-assigns each vector to its nReplica nearest
    * centroids — SPANN's replica/closure assignment
    * (`spann_configuration.rs` `nreplica_count`), which is what keeps
    * recall high on weakly-clustered data at the cost of nReplica×
    * posting storage.
    */
  def build(vecs: DataFrame, nCentroids: Int, nReplica: Int = 2,
      seed: Long = 42L, maxIter: Int = 20): Model = {
    val feats = vecs.select(col("offset_id"), col("embedding"),
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val km = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(maxIter)
    val model = km.fit(feats)
    val spark = vecs.sparkSession
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat).toSeq)
      }.toSeq).toDF("centroid_id", "centroid")
    Model(centroids, assign(vecs, centroids, nReplica))
  }

  /** Posting assignment of a vector batch against FIXED centroids — each
    * vector goes to its `nReplica` nearest lists. Per-vector independent,
    * so it is also the incremental index-maintenance step: a WAL-tail
    * micro-batch appends `assign(batch, centroids, r)` to the posting
    * table and the result is row-identical to a full batch rebuild over
    * the same centroids (SPANN appends to posting lists between
    * centroid-split compactions; `rust/index/src/spann/types.rs`).
    */
  def assign(vecs: DataFrame, centroids: DataFrame, nReplica: Int): DataFrame = {
    val cdist = Distances.distance("l2")(col("centroid"), col("embedding"))
    GroupedTopK(
      vecs.crossJoin(broadcast(centroids))
        .select(col("offset_id"), col("embedding"), col("centroid_id"),
          cdist.as("cdist")),
      Seq(col("offset_id")), Seq(col("cdist"), col("centroid_id")), nReplica)
      .select(col("centroid_id"), col("offset_id"), col("embedding"))
  }

  /** ANN search: route each query to its `nprobe` nearest centroids, scan
    * only those posting lists, top-k per query. Same output shape as
    * [[Knn.exact]].
    */
  def search(model: Model, queries: DataFrame, k: Int, nprobe: Int,
      space: String = "cosine"): DataFrame = {
    val cdist = Distances.distance(space)(col("centroid"), col("q_embedding"))
    val routed = GroupedTopK(
      queries.crossJoin(broadcast(model.centroids))
        .select(col("query_id"), col("q_embedding"), col("centroid_id"),
          cdist.as("cdist")),
      Seq(col("query_id")), Seq(col("cdist"), col("centroid_id")), nprobe)
      .select(col("query_id"), col("q_embedding"), col("centroid_id"))

    val topk = udaf(new Knn.TopKAgg(k))
    val dist = Distances.distance(space)(col("embedding"), col("q_embedding"))
    model.postings
      .join(broadcast(routed), Seq("centroid_id"))
      .select(col("query_id"), col("offset_id"), dist.as("dist"))
      .groupBy(col("query_id"))
      .agg(topk(col("offset_id"), col("dist")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.oid").as("offset_id"), col("col.dist").as("dist"))
  }
}
