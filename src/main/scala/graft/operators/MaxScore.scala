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
  * On top of the per-list global upper bounds, posting lists carry
  * per-block maxima (Block-Max WAND refinement, `sparse/maxscore.rs`
  * block structure): the abandonment check for a candidate doc uses the
  * max weight of the block containing that doc instead of the whole-list
  * max, which is much tighter on lists whose heavy entries cluster — and
  * the subsequent lookup binary-searches only within that block.
  *
  * Term ids are LONG (xxhash64 of the term — unbounded vocabulary, no
  * global dictionary sort; see `queries/SparsePack`).
  *
  * Spark shape: posting lists partitioned by doc hash; each partition runs
  * MaxScore locally over its term→postings map and emits its top-k; the
  * global merge is the same bounded aggregate as KNN. Per-partition
  * thresholds converge independently — pruning power equals the
  * single-node algorithm's within each shard, and shards are the unit of
  * parallelism at 100 TB.
  */
object MaxScore {

  /** Docs per block for the block-max structure. */
  private[graft] val BlockSize = 64

  private final case class PList(docs: Array[Long], ws: Array[Float],
      qw: Float, ub: Float, blockLastDoc: Array[Long], blockMax: Array[Float])

  private def buildPList(docs: Array[Long], ws: Array[Float], qw: Float): PList = {
    var mx = 0f; var i = 0
    while (i < ws.length) { if (ws(i) > mx) mx = ws(i); i += 1 }
    val nBlocks = (docs.length + BlockSize - 1) / BlockSize
    val blockLastDoc = new Array[Long](nBlocks)
    val blockMax = new Array[Float](nBlocks)
    var b = 0
    while (b < nBlocks) {
      val end = math.min((b + 1) * BlockSize, docs.length)
      blockLastDoc(b) = docs(end - 1)
      var bm = 0f; var j = b * BlockSize
      while (j < end) { if (ws(j) > bm) bm = ws(j); j += 1 }
      blockMax(b) = bm
      b += 1
    }
    PList(docs, ws, qw, qw * mx, blockLastDoc, blockMax)
  }

  /** Block index containing `doc` (first block with lastDoc >= doc), or -1
    * if doc is past the list's end.
    */
  private def blockOf(p: PList, doc: Long): Int = {
    var lo = 0; var hi = p.blockLastDoc.length - 1
    if (hi < 0 || doc > p.blockLastDoc(hi)) return -1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (p.blockLastDoc(mid) < doc) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Local MaxScore: postings = term -> sorted (doc, weight) arrays. */
  private[graft] def topkLocal(
      postings: Map[Long, (Array[Long], Array[Float])],
      query: Seq[(Long, Float)], k: Int): Seq[(Long, Float)] = {
    val terms: Array[PList] = query.filter(q => postings.contains(q._1))
      .map { case (t, qw) => val (docs, ws) = postings(t); buildPList(docs, ws, qw) }
      .sortBy(_.ub) // ascending upper bound
      .toArray
    if (terms.isEmpty) return Nil
    val n = terms.length
    val ubPrefix = terms.scanLeft(0f)((acc, t) => acc + t.ub) // len n+1
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

    // scratch: per-candidate block index and block-max prefix for the
    // non-essential lists 0..essentialFrom-1
    val blkIdx = new Array[Int](n)
    val bmPrefix = new Array[Float](n + 1)

    while (essentialFrom < n) {
      // next doc: min current doc across essential lists
      var doc = Long.MaxValue
      var j = essentialFrom
      while (j < n) {
        val p = terms(j)
        if (cursor(j) < p.docs.length && p.docs(cursor(j)) < doc) doc = p.docs(cursor(j))
        j += 1
      }
      if (doc == Long.MaxValue) { essentialFrom = n }
      else {
        // score from essential lists; advance their cursors past doc
        var score = 0f
        j = essentialFrom
        while (j < n) {
          val p = terms(j)
          if (cursor(j) < p.docs.length && p.docs(cursor(j)) == doc) {
            score += p.qw * p.ws(cursor(j)); cursor(j) += 1
          }
          j += 1
        }
        // Block-max bounds for the non-essential lists: bmPrefix(l) =
        // Σ_{i<l} qw_i * blockMax_i(doc) — tighter than ubPrefix because it
        // bounds only the block that could contain this doc.
        var l = 0
        while (l < essentialFrom) {
          val b = blockOf(terms(l), doc)
          blkIdx(l) = b
          bmPrefix(l + 1) = bmPrefix(l) + (if (b < 0) 0f else terms(l).qw * terms(l).blockMax(b))
          l += 1
        }
        // non-essential lookups with early abandon on the block-max bound:
        // current bound = actual score so far + block-max bounds of lists
        // not yet looked up. Abandonment only skips provably-losing docs —
        // surviving docs are fully evaluated, so results stay exact.
        var jj = essentialFrom - 1
        var abandoned = false
        while (jj >= 0 && !abandoned) {
          if (heap.size >= k && score + bmPrefix(jj + 1) < threshold) abandoned = true
          else {
            val b = blkIdx(jj)
            if (b >= 0) {
              val p = terms(jj)
              val from = b * BlockSize
              val to = math.min((b + 1) * BlockSize, p.docs.length)
              val idx = java.util.Arrays.binarySearch(p.docs, from, to, doc)
              if (idx >= 0) score += p.qw * p.ws(idx)
            }
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

  /** Distributed exact sparse top-k: postings (term_id LONG, doc_id LONG,
    * w FLOAT) sharded by doc; query broadcast; per-shard MaxScore + merge.
    * Output: (doc_id, score) top-k by (score desc, doc_id).
    */
  def topk(postings: DataFrame, query: Seq[(Long, Float)], k: Int): DataFrame = {
    val spark = postings.sparkSession
    val qB = spark.sparkContext.broadcast(query)
    val local = postings
      .repartition(col("doc_id"))
      .select(col("term_id"), col("doc_id"), col("w")).rdd
      .mapPartitions { it =>
        val byTerm = mutable.HashMap[Long, mutable.ArrayBuffer[(Long, Float)]]()
        it.foreach { r =>
          byTerm.getOrElseUpdate(r.getLong(0), mutable.ArrayBuffer())
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
