package graft

import graft.api.Client
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IndexAndWal — the reference's DEFAULT served-read level
  * (`rust/types/src/execution/plan.rs:553-565`): every KNN runs a
  * brute-force `KnnLog` leg over the un-compacted WAL tail in parallel
  * with the index leg and `KnnMerge`s the results
  * (`rust/worker/src/execution/orchestration/knn.rs:44-100`,
  * `operators/knn_log.rs`). These gates prove the facade's served reads
  * see writes that arrived AFTER the last compaction: adds appear,
  * updates score on their new embedding (the stale indexed version is
  * shadowed), deletes disappear — with no compaction between write and
  * query.
  */
class ClientAnnTailSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dim = 8

  private def vec(i: Int): Seq[Float] =
    Seq.tabulate(dim)(j => math.sin(i * 31.0 + j * 7.0).toFloat)

  private def vecDf(ids: Seq[Int]): DataFrame =
    ids.map(i => (s"v-$i", vec(i))).toDF("id", "embedding")

  private def queriesOf(ids: Seq[Int]): DataFrame =
    ids.map(i => (i.toLong, vec(i))).toDF("query_id", "q_embedding")

  private def freshClient(): Client =
    new Client(spark,
      java.nio.file.Files.createTempDirectory("graft_tail").toString)

  /** Exact reference answer over the live RYW state (the in-plan KNN). */
  private def exactTop(h: graft.api.CollectionHandle, qs: DataFrame,
      k: Int): Map[(Long, Long), String] =
    h.asCollection.query(qs, k, space = "cosine")
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap

  test("add-then-query: exhaustive probe over index+tail equals exact KNN") {
    val client = freshClient()
    val coll = client.createCollection("vs")
    coll.add(vecDf(20 until 100))
    coll.persist() // compacted segment: v-20..v-99
    coll.add(vecDf(0 until 20)) // un-compacted tail
    val qs = queriesOf(Seq(0, 5, 50))
    val got = coll.queryAnn(qs, k = 10, nprobe = 8, nCentroids = 8)
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val want = exactTop(coll, qs, 10)
    // nprobe == nCentroids makes the index leg exhaustive, so the merge
    // must be EXACTLY the brute-force answer — tail records included
    assert(got == want)
    // the tail query vectors are their own nearest neighbors: records
    // the index has never seen are served
    assert(got((0L, 1L)) == "v-0" && got((5L, 1L)) == "v-5")
  }

  test("update since compaction scores on the NEW embedding") {
    val client = freshClient()
    val coll = client.createCollection("vs_upd")
    coll.add(vecDf(0 until 60))
    coll.persist()
    // move v-7 onto v-200's direction: a query at vec(200) must now find
    // v-7 at distance ~0, and v-7's OLD indexed position must not surface
    coll.update(Seq(("v-7", vec(200))).toDF("id", "embedding"))
    val qs = queriesOf(Seq(200))
    val top = coll.queryAnn(qs, k = 3, nprobe = 8, nCentroids = 8)
      .select("rank", "id", "dist").collect()
    assert(top.find(_.getLong(0) == 1L).get.getString(1) == "v-7")
    assert(top.find(_.getLong(0) == 1L).get.getDouble(2) < 1e-5)
    // querying v-7's OLD position no longer finds it at ~0 distance
    val old = coll.queryAnn(queriesOf(Seq(7)), k = 1, nprobe = 8, nCentroids = 8)
      .select("id", "dist").collect().head
    assert(old.getString(0) != "v-7" || old.getDouble(1) > 1e-3)
  }

  test("delete since compaction disappears from served reads") {
    val client = freshClient()
    val coll = client.createCollection("vs_del")
    coll.add(vecDf(0 until 60))
    coll.persist()
    coll.delete(Seq("v-3"))
    val got = coll.queryAnn(queriesOf(Seq(3)), k = 5, nprobe = 8, nCentroids = 8)
      .select("id").collect().map(_.getString(0))
    assert(got.length == 5 && !got.contains("v-3"))
  }

  test("recall gate holds at normal nprobe with a live tail") {
    val client = freshClient()
    val coll = client.createCollection("vs_recall")
    coll.add(vecDf(30 until 150))
    coll.persist()
    coll.add(vecDf(0 until 30))
    val qs = queriesOf(Seq(1, 40, 90))
    val want = exactTop(coll, qs, 10).groupBy(_._1._1)
      .view.mapValues(_.values.toSet).toMap
    val got = coll.queryAnn(qs, k = 10, nprobe = 4, nCentroids = 8)
      .select("query_id", "id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val recall = qs.collect().map(_.getLong(0)).map { q =>
      (want(q) intersect got(q)).size.toDouble / want(q).size
    }.sum / 3.0
    assert(recall >= 0.95, s"recall $recall < 0.95")
  }

  test("re-compaction after update-in-place rebuilds the index (segTag)") {
    val client = freshClient()
    val coll = client.createCollection("vs_recompact")
    coll.add(vecDf(0 until 60))
    coll.persist()
    coll.update(Seq(("v-9", vec(300))).toDF("id", "embedding"))
    // second compaction: SAME row count, different content — the
    // content-fingerprint build key must force an index rebuild, because
    // the WAL tail resets here and can no longer cover the change
    coll.persist()
    val top = coll.queryAnn(queriesOf(Seq(300)), k = 1, nprobe = 8,
      nCentroids = 8).select("id", "dist").collect().head
    assert(top.getString(0) == "v-9" && top.getDouble(1) < 1e-5)
  }

  test("quantized served read merges the tail") {
    val client = freshClient()
    val coll = client.createCollection("vs_q")
    coll.add(vecDf(20 until 100))
    coll.persist()
    coll.add(vecDf(0 until 20))
    val got = coll.queryAnnQuantized(queriesOf(Seq(0, 5)), k = 5,
        nprobe = 8, dim = dim, nCentroids = 8)
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got((0L, 1L)) == "v-0" && got((5L, 1L)) == "v-5")
  }

  test("multi-bit quantized served read merges the tail and sees deletes") {
    val client = freshClient()
    val coll = client.createCollection("vs_mb")
    coll.add(vecDf(20 until 100))
    coll.persist()
    coll.add(vecDf(0 until 20)) // un-compacted tail
    coll.delete(Seq("v-40"))    // delete a COMPACTED record via the tail
    val got = coll.queryAnnQuantizedMb(queriesOf(Seq(0, 5, 40)), k = 5,
        nprobe = 8, bits = 4, alpha = 40, nCentroids = 8)
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // tail records the code table has never seen serve at rank 1
    assert(got((0L, 1L)) == "v-0" && got((5L, 1L)) == "v-5")
    // the deleted compacted record is shadowed, k results survive
    assert(!got.values.toSet.contains("v-40"))
    assert(got.keys.count(_._1 == 40L) == 5)
  }

  test("hnsw served read merges the tail") {
    val client = freshClient()
    val coll = client.createCollection("vs_h")
    coll.add(vecDf(20 until 100))
    coll.persist()
    coll.add(vecDf(0 until 20))
    coll.delete(Seq("v-50"))
    val got = coll.queryAnnHnsw(queriesOf(Seq(0, 5, 50)), k = 5, efSearch = 128)
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // tail records serve; the deleted compacted record is shadowed
    assert(got((0L, 1L)) == "v-0" && got((5L, 1L)) == "v-5")
    assert(!got.values.toSet.contains("v-50"))
    assert(got.keys.count(_._1 == 50L) == 5) // over-fetch keeps k results
  }

  test("sparse served read merges the tail and shadows stale docs") {
    import graft.sources.CollectionStore
    val root = specRoot("sparse_tail")
    def svDf(rows: Seq[(Long, Seq[(Long, Float)])]): DataFrame =
      rows.map { case (id, pairs) =>
        val s = pairs.sortBy(_._1)
        (id, s.map(_._1), s.map(_._2))
      }.toDF("offset_id", "ti", "tv")
        .select(col("offset_id"),
          map(lit("tf"), struct(col("ti").as("indices"),
            col("tv").as("values"))).as("meta_sparse"))
    // served corpus: docs 0..9 carry term 100 with weight = doc_id+1
    val recs = svDf((0L until 10L).map(i =>
      i -> Seq(100L -> (i + 1).toFloat, 200L + i -> 1.0f)))
    CollectionStore.sparseServing(recs, "tf", root, nBuckets = 4)
    // tail: doc 50 is NEW with a huge weight; doc 9 (served top-1) is
    // UPDATED down to weight 0.5
    val tail = svDf(Seq(
      50L -> Seq(100L -> 99.0f),
      9L -> Seq(100L -> 0.5f)))
    val got = CollectionStore.sparseServedSearch(spark, root, "tf",
        query = Seq(100L -> 1.0f), k = 3, nBuckets = 4, tail = Some(tail))
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // new doc ranks first; updated doc 9 scores its NEW weight (or drops
    // out of top-3 entirely — 0.5 < the 8.0/9.0 of docs 7/8)
    assert(got.contains(50L) && got(50L) == 99.0)
    assert(!got.contains(9L) || got(9L) == 0.5)
    assert(got.contains(8L) && got(8L) == 9.0) // doc 8 weight 9.0 still served
  }
}
