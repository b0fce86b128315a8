package graft.operators

import graft.functions.Distances
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact batch K-nearest-neighbor — the reference's `Knn`/`KnnBatch` plan
  * (`rust/types/src/execution/plan.rs:114`, `operator.rs:290-314`) as a
  * Catalyst plan.
  *
  * Scale design (the part that must survive 100 TB): a naive
  * `Window.partitionBy(query_id).orderBy(dist)` ships EVERY candidate row
  * through the shuffle — at 1B vectors × q queries that is the whole
  * dataset, with one reducer per query (extreme skew). Instead the top-k is
  * a **partial aggregate** ([[TopKAgg]]): Catalyst plans
  * partial_topk(map side) → shuffle k rows per partition per query →
  * final merge. Shuffle volume is `partitions × queries × k`, independent
  * of data size — the same shape as the reference's per-shard mini-heaps +
  * `KnnMerge` k-way merge (`operators/knn_merge.rs`).
  *
  * Queries are broadcast (`BroadcastNestedLoopJoin`) so the candidate scan
  * never shuffles.
  */
object Knn {

  case class Scored(oid: Long, dist: Double)

  /** Bounded top-k accumulator, ascending (dist, oid). Associative +
    * commutative (the reference's `StatisticsFunction` contract,
    * `statistics.rs:29-40`) so Spark can partial-aggregate it map-side.
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private val ord: Ordering[Scored] = Ordering.by(s => (s.dist, s.oid))
    override def zero: Seq[Scored] = Nil
    // dedup by oid: IVF replica assignment can surface the same vector
    // from several posting lists (identical dist, so dropping is safe).
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.size >= k && ord.gteq(a, b.last)) b
      else if (b.exists(_.oid == a.oid)) b
      else ((b :+ a).sorted(ord)).take(k)
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
      (x ++ y).sorted(ord).distinctBy(_.oid).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
  }

  /** Exact KNN: for each row of `queries` (query_id LONG, q_embedding
    * ARRAY<FLOAT>), the k nearest `candidates` (offset_id LONG, embedding
    * ARRAY<FLOAT>) by `space` distance. Returns
    * (query_id, rank, offset_id, dist) with rank 1..k by (dist, offset_id).
    */
  def exact(candidates: DataFrame, queries: DataFrame, k: Int,
      space: String = "cosine"): DataFrame = {
    val topk = udaf(new TopKAgg(k))
    val dist = Distances.distance(space)(col("embedding"), col("q_embedding"))
    candidates
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("offset_id"), dist.as("dist"))
      .groupBy(col("query_id"))
      .agg(topk(col("offset_id"), col("dist")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.oid").as("offset_id"), col("col.dist").as("dist"))
  }

  /** KnnMerge (`operators/knn_merge.rs`, `operator.rs:460-497`): k-way merge
    * of per-source result lists, dedup by offset_id keeping min distance,
    * re-rank, take k.
    */
  def merge(results: Seq[DataFrame], k: Int): DataFrame = {
    val unioned = results.reduce(_ union _)
    val best = unioned
      .groupBy(col("query_id"), col("offset_id"))
      .agg(min(col("dist")).as("dist"))
    val topk = udaf(new TopKAgg(k))
    best
      .groupBy(col("query_id"))
      .agg(topk(col("offset_id"), col("dist")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.oid").as("offset_id"), col("col.dist").as("dist"))
  }
}
