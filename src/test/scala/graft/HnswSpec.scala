package graft

import graft.operators.{Hnsw, Knn}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HNSW recall gate vs exact KNN — the reference's own ann_accuracy
  * invariant (recall >= 0.95, `invariants.py:281`) for its default index.
  */
class HnswSpec extends AnyFunSuite {
  import SparkTestSession.{spark, specRoot}
  private val sf = "/root/testdata/sf0.01"

  test("per-partition HNSW + merge: recall@10 >= 0.95 vs exact") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("offset_id"), col("embedding"))
      .repartition(4)
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "offset_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = rs(Knn.exact(
      Tables.embeddings(spark, sf).select(col("vec_id").as("offset_id"), col("embedding")),
      queries, 10))
    val approx = rs(Hnsw.search(vecs, queries, 10))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.95, s"HNSW recall $recall < 0.95")
  }

  test("served HNSW: persisted graphs match recall gate and reuse skips rebuild") {
    import graft.sources.CollectionStore
    val root = specRoot("hnsw")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("offset_id"), col("embedding"))
      .repartition(4)
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "offset_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    CollectionStore.hnswServing(vecs, root)
    val exact = rs(Knn.exact(
      Tables.embeddings(spark, sf).select(col("vec_id").as("offset_id"), col("embedding")),
      queries, 10))
    val served = rs(Hnsw.searchSaved(spark, root, queries, 10))
    val recall = (exact & served).size.toDouble / exact.size
    assert(recall >= 0.95, s"served HNSW recall $recall < 0.95")
    // reuse: marker matches → second serving call must not rewrite graphs
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(root, "hnsw", "graphs"))
    CollectionStore.hnswServing(vecs, root)
    val mtime2 = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(root, "hnsw", "graphs"))
    assert(mtime == mtime2, "second serving call rebuilt the persisted graphs")
    assert(rs(Hnsw.searchSaved(spark, root, queries, 10)) == served)
  }

  test("routed HNSW: recall >= 0.95 at nprobe 8/32, fan-out < full, exhaustive exact") {
    import graft.sources.CollectionStore
    val root = specRoot("hnsw_routed")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val vecsAll = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("offset_id"), col("embedding"))
    // 32 partitions crosses RoutePartitionThreshold → hnswServing builds
    // the centroid-routed layout (centroids persisted beside the graphs)
    CollectionStore.hnswServing(vecsAll.repartition(32), root)
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(root, "hnsw", "centroids")),
      "high-partition build did not produce the routed layout")

    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "offset_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = rs(Knn.exact(vecsAll, queries, 10))

    // realistic routed serving: 8 of 32 centroids per query
    val routed = rs(Hnsw.searchSaved(spark, root, queries, 10, nprobe = 8))
    val recall = (exact & routed).size.toDouble / exact.size
    assert(recall >= 0.95, s"routed HNSW recall $recall < 0.95")

    // fan-out: the probed centroid set is a strict subset of the 32 —
    // the partition-pruned scan reads fewer graph rows than the full
    val cents = spark.read.parquet(s"$root/hnsw/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    assert(cents.length == 32)
    val qArr = queries.select(col("query_id"), col("q_embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val needed = Hnsw.routeQueries(cents, qArr, nprobe = 8).keySet
    assert(needed.size < cents.length,
      s"probe set (${needed.size}) did not prune the full centroid set")
    val scan = spark.read.parquet(s"$root/hnsw/graphs")
      .filter(col("centroid_id").isin(needed.toSeq: _*))
    assert(scan.count() < spark.read.parquet(s"$root/hnsw/graphs").count(),
      "routed scan read every graph row")
    // partition pruning is visible in the physical plan
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"expected centroid_id partition pruning in:\n$plan")

    // exhaustive end: nprobe >= nCentroids + ef >= N == exact KNN rows
    val exh = rs(Hnsw.searchSaved(spark, root, queries, 10,
      efSearch = 1000000, nprobe = Int.MaxValue))
    assert(exh == exact, "exhaustive routed search != exact KNN")
  }

  test("single graph: self-query returns itself first") {
    val g = new Hnsw.Graph(4, 8, 50, 1L, "l2")
    val rnd = new java.util.Random(7)
    val vs = (0 until 200).map(i => i.toLong -> Array.fill(4)(rnd.nextFloat()))
    vs.foreach { case (id, v) => g.insert(id, v) }
    vs.take(20).foreach { case (id, v) =>
      val hits = g.search(v, 1, 32)
      assert(hits.head._1 == id, s"self-nn of $id was ${hits.head}")
    }
  }
}
