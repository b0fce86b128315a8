package graft.operators

import graft.functions.Distances
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

/** HNSW graph index, built **per partition** and merged — the Spark shape
  * of the reference's sharded HNSW segments (`rust/index/src/hnsw.rs`,
  * per-shard search + `KnnMerge`, `orchestration/knn.rs:44-100`).
  *
  * The graph itself is a faithful small HNSW (Malkov & Yashunin 2016,
  * arXiv:1603.09320): exponential level assignment, greedy descent through
  * upper layers, beam (ef) search at layer 0, bidirectional links pruned
  * to M. One graph per partition keeps build embarrassingly parallel and
  * memory-local — each executor owns graphs for its partitions only; a
  * query fans out to every partition's graph (map-side, k per partition)
  * and results merge with the same bounded top-k aggregate as exact KNN.
  *
  * Scale: build is O(N·log N·M·dim) total, no shuffle. Search cost scales
  * with partition count; for very high partition counts route through IVF
  * centroids first (the two compose: HNSW over each centroid's postings).
  */
object Hnsw {

  final class Graph(dim: Int, m: Int, efConstruction: Int, seed: Long,
      space: String) {
    private val dist: (Array[Float], Array[Float]) => Float = space match {
      case "cosine" => (a, b) => 1f - Distances.scalar.cosineSim(a, b)
      case "ip"     => (a, b) => 1f - Distances.scalar.dot(a, b)
      case _        => Distances.scalar.l2Sq _
    }
    private val rng = new java.util.Random(seed)
    private val mL = 1.0 / math.log(m.toDouble)
    private val vecs = mutable.ArrayBuffer[Array[Float]]()
    private val ids = mutable.ArrayBuffer[Long]()
    // neighbors(level)(node) = list of node indices
    private val neighbors = mutable.ArrayBuffer[mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]]()
    private var entry: Int = -1
    private var maxLevel: Int = -1

    private def levelOf(): Int =
      math.floor(-math.log(rng.nextDouble() max 1e-12) * mL).toInt

    /** beam search at one level from `start`, returns up to ef closest. */
    private def searchLevel(q: Array[Float], start: Seq[Int], ef: Int,
        level: Int): mutable.PriorityQueue[(Float, Int)] = {
      val visited = mutable.HashSet[Int](start: _*)
      // candidates: min-heap by dist (negate for PQ); results: max-heap
      val cand = mutable.PriorityQueue[(Float, Int)]()(Ordering.by(-_._1))
      val res = mutable.PriorityQueue[(Float, Int)]()(Ordering.by(_._1))
      start.foreach { s => val d = dist(q, vecs(s)); cand.enqueue((d, s)); res.enqueue((d, s)) }
      while (cand.nonEmpty) {
        val (d, c) = cand.dequeue()
        if (d > res.head._1 && res.size >= ef) { cand.clear() }
        else {
          for (n <- neighbors(level)(c) if !visited(n)) {
            visited += n
            val dn = dist(q, vecs(n))
            if (res.size < ef || dn < res.head._1) {
              cand.enqueue((dn, n)); res.enqueue((dn, n))
              if (res.size > ef) res.dequeue()
            }
          }
        }
      }
      res
    }

    def insert(id: Long, v: Array[Float]): Unit = {
      val node = vecs.length
      vecs += v; ids += id
      val level = levelOf()
      while (neighbors.size <= level) neighbors += mutable.ArrayBuffer()
      for (l <- 0 to level) {
        while (neighbors(l).size <= node) neighbors(l) += mutable.ArrayBuffer[Int]()
      }
      // also pad lower levels for nodes added when level grows
      for (l <- neighbors.indices) {
        while (neighbors(l).size <= node) neighbors(l) += mutable.ArrayBuffer[Int]()
      }
      if (entry < 0) { entry = node; maxLevel = level; return }

      var ep = entry
      // greedy descent above the node's level
      for (l <- maxLevel until level by -1) {
        var changed = true
        while (changed) {
          changed = false
          for (n <- neighbors(l)(ep)) {
            if (dist(v, vecs(n)) < dist(v, vecs(ep))) { ep = n; changed = true }
          }
        }
      }
      // connect at each level from min(level, maxLevel) down to 0
      for (l <- math.min(level, maxLevel) to 0 by -1) {
        val found = searchLevel(v, Seq(ep), efConstruction, l).toSeq.sortBy(_._1)
        val mmax = if (l == 0) 2 * m else m
        val selected = found.take(m).map(_._2)
        neighbors(l)(node) = mutable.ArrayBuffer(selected: _*)
        for (n <- selected) {
          val nb = neighbors(l)(n)
          nb += node
          if (nb.size > mmax) {
            // prune to closest mmax
            val pruned = nb.map(x => (dist(vecs(n), vecs(x)), x)).sortBy(_._1)
              .take(mmax).map(_._2)
            neighbors(l)(n) = pruned.to(mutable.ArrayBuffer)
          }
        }
        ep = found.head._2
      }
      if (level > maxLevel) { maxLevel = level; entry = node }
    }

    def search(q: Array[Float], k: Int, efSearch: Int): Seq[(Long, Float)] = {
      if (entry < 0) return Nil
      // Degenerate-exact mode: a beam that can hold every node never
      // evicts, so the walk IS a full scan up to reachability — score
      // all nodes directly instead, which is both cheaper and provably
      // exact even if the graph has unreachable components. This is the
      // ef ≥ N end of the reference's exact/recall dual test modes
      // (chromadb invariants: exhaustive knob ⇒ brute force), and what
      // the *_oracle twin queries pin their hash-exactness on.
      if (efSearch >= vecs.length) {
        val all = new Array[(Long, Float)](vecs.length)
        var i = 0
        while (i < vecs.length) { all(i) = (ids(i), dist(q, vecs(i))); i += 1 }
        return all.sortBy(t => (t._2, t._1)).take(k).toSeq
      }
      var ep = entry
      for (l <- maxLevel until 0 by -1) {
        var changed = true
        while (changed) {
          changed = false
          for (n <- neighbors(l)(ep)) {
            if (dist(q, vecs(n)) < dist(q, vecs(ep))) { ep = n; changed = true }
          }
        }
      }
      searchLevel(q, Seq(ep), math.max(efSearch, k), 0)
        .toSeq.sortBy(_._1).take(k).map { case (d, n) => (ids(n), d) }
    }

    /** Compact serialized state — the analogue of the reference persisting
      * each HNSW segment as a blob (`rust/index/src/hnsw.rs` save/load):
      * one blob per partition graph, stored in parquet.
      */
    def serialize(): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.ObjectOutputStream(bos)
      out.writeObject((m, space, ids.toArray, vecs.toArray,
        neighbors.map(_.map(_.toArray).toArray).toArray, entry, maxLevel))
      out.close()
      bos.toByteArray
    }
  }

  object Graph {
    def deserialize(bytes: Array[Byte]): Graph = {
      val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      val (m, space, ids, vecs, nbrs, entry, maxLevel) = in.readObject()
        .asInstanceOf[(Int, String, Array[Long], Array[Array[Float]],
          Array[Array[Array[Int]]], Int, Int)]
      in.close()
      val dim = if (vecs.nonEmpty) vecs(0).length else 0
      val g = new Graph(dim, m, 0, 0L, space)
      g.ids ++= ids
      g.vecs ++= vecs
      nbrs.foreach { lvl =>
        g.neighbors += lvl.map(n => mutable.ArrayBuffer(n.toSeq: _*))
          .to(mutable.ArrayBuffer)
      }
      g.entry = entry
      g.maxLevel = maxLevel
      g
    }
  }

  /** Compaction-time index build: one graph per input partition, each
    * serialized to a blob row `(pid, blob)` under `<root>/hnsw/graphs` —
    * the reference builds HNSW at compaction and serves queries from the
    * persisted segment (`rust/worker/src/compactor/`, `hnsw.rs` save).
    * Build is embarrassingly parallel, no shuffle. `root` must be shared
    * storage on a real cluster.
    */
  /** One serialized per-partition graph row per input partition —
    * `(pid, blob)`. `pidOffset` keeps pids unique when several graph
    * sets coexist in one table (incremental maintenance appends one set
    * per micro-batch; [[searchSaved]] merges across all of them).
    */
  def graphRows(candidates: DataFrame, m: Int = 16,
      efConstruction: Int = 100, space: String = "cosine",
      pidOffset: Long = 0L): DataFrame = {
    val spark = candidates.sparkSession
    val perPart = candidates.select(col("offset_id"), col("embedding")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val dim = rows.head.getSeq[Float](1).length
          val g = new Graph(dim, m, efConstruction, seed = 42L + pidOffset + pid, space)
          rows.foreach(r => g.insert(r.getLong(0), r.getSeq[Float](1).toArray))
          Iterator(Row(pidOffset + pid, g.serialize()))
        }
      }
    // pid is a LONG: incremental maintenance packs (batchId << 16 | part)
    // and an Int overflows at batchId >= 32768
    val schema = StructType(Seq(StructField("pid", LongType),
      StructField("blob", BinaryType)))
    spark.createDataFrame(perPart, schema)
  }

  def buildAndSave(candidates: DataFrame, root: String,
      m: Int = 16, efConstruction: Int = 100, space: String = "cosine"): Unit = {
    // a flat rebuild over a previously-ROUTED root must retire the stale
    // centroid table — its mere presence flips searchSaved into routed
    // mode, which would misroute against the flat (pid, blob) graphs.
    // Retire BEFORE writing: a crash in between leaves old routed graphs
    // with no centroids, which the flat path still scans correctly
    // (un-routed), never the reverse (flat graphs + stale centroids). A
    // FAILED delete must abort the rebuild loudly — a surviving centroid
    // table would flip searchSaved into routed mode against the new flat
    // (pid, blob) graphs.
    val staleCentroids = new java.io.File(s"$root/hnsw/centroids")
    if (staleCentroids.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(staleCentroids)
    graphRows(candidates, m, efConstruction, space)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/hnsw/graphs")
  }

  /** Input-partition count past which
    * [[graft.sources.CollectionStore.hnswServing]] switches from the flat
    * layout (EVERY graph scanned per query batch) to the centroid-ROUTED
    * one — the reference's SPANN centers-search
    * (`orchestration/spann_knn.rs:36`): one graph per k-means centroid,
    * the graph table partitioned by `centroid_id`, and each query probing
    * only its `nprobe` nearest centroids' graphs. Flat fan-out is fine to
    * a handful of graphs; past that, every added partition is query-time
    * deserialize+walk work with no recall gain, while the routed read
    * stays O(nprobe) graphs per query batch at ANY partition count.
    */
  val RoutePartitionThreshold: Int = 8

  /** Centroid-routed index build: k-means centroids, nReplica
    * multi-assignment (SPANN closure assignment — boundary vectors live
    * in several graphs, which is what keeps routed recall high), one HNSW
    * graph per centroid's posting list. The graph table is PARTITIONED BY
    * `centroid_id`, so a routed query batch's scan partition-prunes to
    * its probed centroids' directories; centroids persist beside it and
    * their presence is what flips [[searchSaved]] into routed mode.
    */
  def buildRoutedAndSave(candidates: DataFrame, root: String,
      nCentroids: Int, nReplica: Int = 2, m: Int = 16,
      efConstruction: Int = 100, space: String = "cosine",
      seed: Long = 42L, knownCount: Option[Long] = None,
      fitSampleMax: Long = Ivf.FitSampleMax): Unit = {
    val spark = candidates.sparkSession
    val model = Ivf.build(candidates, nCentroids, nReplica, seed,
      fitSampleMax = fitSampleMax, knownCount = knownCount)
    val rows = model.postings
      .repartition(col("centroid_id"))
      .select(col("centroid_id"), col("offset_id"), col("embedding")).rdd
      .mapPartitions { it =>
        // a hash partition may hold several centroids' lists — one graph
        // per centroid regardless
        it.toArray.groupBy(_.getInt(0)).iterator.map { case (cid, rs) =>
          val dim = rs.head.getSeq[Float](2).length
          val g = new Graph(dim, m, efConstruction, seed = seed + cid, space)
          rs.foreach(r => g.insert(r.getLong(1), r.getSeq[Float](2).toArray))
          Row(cid, g.serialize())
        }
      }
    val schema = StructType(Seq(StructField("centroid_id", IntegerType),
      StructField("blob", BinaryType)))
    spark.createDataFrame(rows, schema)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("centroid_id").parquet(s"$root/hnsw/graphs")
    model.centroids.select(col("centroid_id"), col("centroid"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/hnsw/centroids")
  }

  /** Driver-side query→centroid routing (queries are a bounded client
    * batch; centroids are the index's routing table — thousands of rows):
    * each query's `nprobe` nearest centroids by L2, the same metric
    * [[Ivf.assign]] used to place the vectors. Returns centroid →
    * routed queries.
    */
  private[graft] def routeQueries(cents: Array[(Int, Array[Float])],
      queries: Array[(Long, Array[Float])],
      nprobe: Int): Map[Int, Array[(Long, Array[Float])]] =
    queries.flatMap { case (qid, q) =>
      cents.map { case (cid, c) =>
          (graft.functions.Distances.scalar.l2Sq(q, c), cid) }
        .sortBy(t => (t._1, t._2))
        .take(math.min(nprobe, cents.length))
        .map { case (_, cid) => cid -> ((qid, q)) }
    }.groupBy(_._1).map { case (cid, xs) => cid -> xs.map(_._2) }

  /** Query-time search over the persisted graphs: the query batch (bounded
    * by the client batch quota — hundreds of rows, kilobytes) ships to
    * executors ONCE as a broadcast variable; the graphs scan maps
    * partition-locally, so each blob row is touched exactly once and never
    * duplicated per query (a crossJoin here materializes blob × query rows
    * — q × 64 MB of heap churn per partition at serving scale).
    * Returns (query_id, rank, offset_id, dist).
    */
  def searchSaved(spark: org.apache.spark.sql.SparkSession, root: String,
      queries: DataFrame, k: Int, efSearch: Int = 64,
      nprobe: Int = 8): DataFrame = {
    // a persisted centroid table marks the routed layout — serve through
    // centers-search instead of the all-graphs fan-out
    if (java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(root, "hnsw", "centroids")))
      return searchRoutedSaved(spark, root, queries, k, nprobe, efSearch)
    val graphs = graft.sources.CollectionStore.readCached(spark, s"$root/hnsw/graphs")
    val qArr = queries.select(col("query_id"), col("q_embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bq = spark.sparkContext.broadcast(qArr)
    val perPart = graphs.select(col("blob")).rdd.mapPartitions { it =>
      val qs = bq.value
      it.flatMap { r =>
        // one deserialize per blob row; all queries probe the same graph
        val g = Graph.deserialize(r.getAs[Array[Byte]](0))
        qs.iterator.flatMap { case (qid, q) =>
          g.search(q, k, math.max(efSearch, k))
            .map { case (id, d) => Row(qid, id, d.toDouble) }
        }
      }
    }
    mergeTopK(spark, perPart, k)
  }

  /** Query-time search over the centroid-ROUTED layout: route the query
    * batch driver-side ([[routeQueries]]), scan ONLY the probed
    * centroids' graph partitions (`centroid_id` is a partition column —
    * the `.isin` filter prunes unprobed directories at the parquet
    * scan), run each graph against just the queries routed to it, exact
    * top-k merge (TopKAgg dedups replica-assigned vectors appearing in
    * several probed graphs). `nprobe >= nCentroids` with `efSearch >= N`
    * is the exhaustive end: every graph is scanned degenerate-exact and
    * the union of posting lists covers every vector — what the
    * `vs_ann_hnsw_routed_oracle` twin pins hash-exactly.
    */
  def searchRoutedSaved(spark: org.apache.spark.sql.SparkSession,
      root: String, queries: DataFrame, k: Int, nprobe: Int = 8,
      efSearch: Int = 64): DataFrame = {
    val cents = spark.read.parquet(s"$root/hnsw/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val qArr = queries.select(col("query_id"), col("q_embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val routed = routeQueries(cents, qArr, nprobe)
    val needed = routed.keys.toSeq
    val bq = spark.sparkContext.broadcast(routed)
    val graphs = graft.sources.CollectionStore
      .readCached(spark, s"$root/hnsw/graphs")
      .filter(col("centroid_id").isin(needed: _*))
    val perPart = graphs.select(col("centroid_id"), col("blob")).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val qs = bq.value.getOrElse(r.getInt(0),
            Array.empty[(Long, Array[Float])])
          if (qs.isEmpty) Iterator.empty
          else {
            val g = Graph.deserialize(r.getAs[Array[Byte]](1))
            qs.iterator.flatMap { case (qid, q) =>
              g.search(q, k, math.max(efSearch, k))
                .map { case (id, d) => Row(qid, id, d.toDouble) }
            }
          }
        }
      }
    mergeTopK(spark, perPart, k)
  }

  /** Global exact merge of per-graph partial results — the same bounded
    * top-k as KnnMerge, dedup by offset_id.
    */
  private def mergeTopK(spark: org.apache.spark.sql.SparkSession,
      perPart: org.apache.spark.rdd.RDD[Row], k: Int): DataFrame = {
    val schema = StructType(Seq(StructField("query_id", LongType),
      StructField("offset_id", LongType), StructField("dist", DoubleType)))
    val local = spark.createDataFrame(perPart, schema)
    val topk = udaf(new Knn.TopKAgg(k))
    local.groupBy(col("query_id"))
      .agg(topk(col("offset_id"), col("dist")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.oid").as("offset_id"), col("col.dist").as("dist"))
  }

  /** Ad-hoc one-shot search: build into an ephemeral root, then serve from
    * it — one code path with the persisted index, no driver round-trip of
    * queries. Long-lived collections use
    * [[graft.sources.CollectionStore.hnswServing]] instead so the build
    * cost amortizes across queries.
    */
  def search(candidates: DataFrame, queries: DataFrame, k: Int,
      space: String = "cosine", m: Int = 16, efConstruction: Int = 100,
      efSearch: Int = 64): DataFrame = {
    // under the SHARED index root (SPARK_GRAFT_INDEX_DIR on a real
    // cluster) — /tmp is driver-local and executors can't read it
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "/tmp/graft_index") +
      s"/adhoc/${java.util.UUID.randomUUID()}"
    buildAndSave(candidates, root, m, efConstruction, space)
    searchSaved(candidates.sparkSession, root, queries, k, efSearch)
  }
}
