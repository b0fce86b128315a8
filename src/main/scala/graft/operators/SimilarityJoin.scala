package graft.operators

import graft.functions.Distances
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KNN join — each left row matched to its top-k right rows by embedding
  * distance (the "similarity join" the reference's KNN plan implies but
  * never generalizes; SURVEY §2.3).
  *
  * - [[exact]]: cartesian + partial top-k aggregate. Correct at any size
  *   but O(|L|·|R|) distance evals — the oracle-checkable baseline.
  * - [[ivf]]: both sides routed through an [[Ivf.Model]] — right rows live
  *   in their centroid's posting list, left rows probe `nprobe` lists, and
  *   the join is shuffle-colocated on `centroid_id`. Work drops to
  *   ~|L|·|R|·nprobe/nCentroids; recall gated in ScalaTest.
  */
object SimilarityJoin {

  /** left: (left_id, embedding); right: (offset_id, embedding). */
  def exact(left: DataFrame, right: DataFrame, k: Int,
      space: String = "cosine"): DataFrame = {
    val topk = udaf(new Knn.TopKAgg(k))
    val dist = Distances.distance(space)(col("embedding"), col("l_embedding"))
    // broadcast the (small) left/query side: the candidate scan stays
    // shuffle-free and the cartesian is a BroadcastNestedLoopJoin, same as
    // Knn.exact.
    right.crossJoin(broadcast(left.select(col("left_id"), col("embedding").as("l_embedding"))))
      .select(col("left_id"), col("offset_id"), dist.as("dist"))
      .groupBy(col("left_id"))
      .agg(topk(col("offset_id"), col("dist")).as("nn"))
      .select(col("left_id"), posexplode(col("nn")))
      .select(col("left_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.oid").as("offset_id"), col("col.dist").as("dist"))
  }

  /** IVF-routed approximate KNN join (the 100 TB path). */
  def ivf(model: Ivf.Model, left: DataFrame, k: Int, nprobe: Int,
      space: String = "cosine"): DataFrame = {
    val queries = left.select(col("left_id").as("query_id"),
      col("embedding").as("q_embedding"))
    Ivf.search(model, queries, k, nprobe, space)
      .withColumnRenamed("query_id", "left_id")
  }
}
