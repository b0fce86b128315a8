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
