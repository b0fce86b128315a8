package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

/** MaxScore dynamic pruning for sparse top-k — the reference's sparse KNN
  * path (`rust/index/src/sparse/{maxscore.rs,reader.rs}`: document-at-a-
  * time traversal with per-term upper bounds, skipping documents that
  * cannot beat the running threshold). Exact results — pruning only skips
  * provably-losing documents — so the output is hash-identical to the
  * brute-force scorer.
  *
  * Spark shape: posting lists partitioned by doc hash; each partition runs
  * MaxScore locally over its term→postings map and emits its top-k; the
  * global merge is the same bounded aggregate as KNN. Per-partition
  * thresholds converge independently — pruning power equals the
  * single-node algorithm's within each shard, and shards are the unit of
  * parallelism at 100 TB.
  */
object MaxScore {

  /** Local MaxScore: postings = term -> sorted (doc, weight) arrays. */
  private[graft] def topkLocal(
      postings: Map[Int, (Array[Long], Array[Float])],
      query: Seq[(Int, Float)], k: Int): Seq[(Long, Float)] = {
    val terms = query.filter(q => postings.contains(q._1))
      .map { case (t, qw) =>
        val (docs, ws) = postings(t)
        var mx = 0f; var i = 0
        while (i < ws.length) { if (ws(i) > mx) mx = ws(i); i += 1 }
        (docs, ws, qw, qw * mx)
      }
      .sortBy(_._4) // ascending upper bound
    if (terms.isEmpty) return Nil
    val n = terms.length
    val ubPrefix = terms.scanLeft(0f)((acc, t) => acc + t._4).toArray // len n+1
    val cursor = Array.fill(n)(0)
    // min-heap of current top-k (score, doc) — threshold = heap head
    val heap = mutable.PriorityQueue[(Float, Long)]()(Ordering.by(s => (-s._1, s._2)))
    def threshold: Float = if (heap.size < k) 0f else heap.head._1

    // Lists whose cumulative upper bound cannot beat (or tie) the threshold
    // are non-essential: docs appearing only there are provably losers.
    // Strict < keeps threshold-TYING docs alive (tie-break is doc asc).
    var essentialFrom = 0
    def updateEssential(): Unit = {
      var j = 0
      while (j < n && heap.size >= k && ubPrefix(j + 1) < threshold) j += 1
      essentialFrom = j
    }

    while (essentialFrom < n) {
      // next doc: min current doc across essential lists
      var doc = Long.MaxValue
      var j = essentialFrom
      while (j < n) {
        val (docs, _, _, _) = terms(j)
        if (cursor(j) < docs.length && docs(cursor(j)) < doc) doc = docs(cursor(j))
        j += 1
      }
      if (doc == Long.MaxValue) { essentialFrom = n }
      else {
        // score from essential lists; advance their cursors past doc
        var score = 0f
        j = essentialFrom
        while (j < n) {
          val (docs, ws, qw, _) = terms(j)
          if (cursor(j) < docs.length && docs(cursor(j)) == doc) {
            score += qw * ws(cursor(j)); cursor(j) += 1
          }
          j += 1
        }
        // non-essential lookups with early abandon: current bound =
        // actual score so far + upper bounds of lists not yet looked up
        var jj = essentialFrom - 1
        var abandoned = false
        while (jj >= 0 && !abandoned) {
          if (heap.size >= k && score + ubPrefix(jj + 1) < threshold) abandoned = true
          else {
            val (docs, ws, qw, _) = terms(jj)
            val idx = java.util.Arrays.binarySearch(docs, doc)
            if (idx >= 0) score += qw * ws(idx)
            jj -= 1
          }
        }
        if (!abandoned) {
          if (heap.size < k) heap.enqueue((score, doc))
          else if (score > heap.head._1 ||
            (score == heap.head._1 && doc < heap.head._2)) {
            heap.dequeue(); heap.enqueue((score, doc))
          }
          updateEssential()
        }
      }
    }
    heap.toSeq.sortBy(s => (-s._1, s._2)).map { case (s, d) => (d, s) }
  }

  /** Distributed exact sparse top-k: postings (term_id INT, doc_id LONG,
    * w FLOAT) sharded by doc; query broadcast; per-shard MaxScore + merge.
    * Output: (doc_id, score) top-k by (score desc, doc_id).
    */
  def topk(postings: DataFrame, query: Seq[(Int, Float)], k: Int): DataFrame = {
    val spark = postings.sparkSession
    val qB = spark.sparkContext.broadcast(query)
    val local = postings
      .repartition(col("doc_id"))
      .select(col("term_id"), col("doc_id"), col("w")).rdd
      .mapPartitions { it =>
        val byTerm = mutable.HashMap[Int, mutable.ArrayBuffer[(Long, Float)]]()
        it.foreach { r =>
          byTerm.getOrElseUpdate(r.getInt(0), mutable.ArrayBuffer())
            .append((r.getLong(1), r.getFloat(2)))
        }
        val p = byTerm.map { case (t, buf) =>
          val sorted = buf.sortBy(_._1)
          t -> (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
        }.toMap
        topkLocal(p, qB.value, k).iterator.map { case (d, s) => Row(d, s.toDouble) }
      }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("score", DoubleType)))
    val topkAgg = udaf(new Knn.TopKAgg(k))
    // reuse the bounded merge: order by (-score, doc) via negated key
    spark.createDataFrame(local, schema)
      .groupBy(lit(1).as("_g"))
      .agg(topkAgg(col("doc_id"), -col("score")).as("nn"))
      .select(posexplode(col("nn")))
      .select(col("col.oid").as("doc_id"), (-col("col.dist")).as("score"))
  }
}
