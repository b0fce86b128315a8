package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `GroupBy` + `Aggregate::MinK/MaxK` (`operator.rs:2306-2400`, physical
  * `operators/ranked_group_by.rs`): keep k records per group by multi-key
  * order, flatten. Missing keys group as NULL; empty groups are simply
  * absent (both free in this formulation).
  *
  * Spark plans this as WindowExec with WindowGroupLimit (Spark >= 3.5),
  * which pushes the k-filter below the sort — per-partition it keeps only
  * k rows per group before the shuffle, the same two-phase shape as
  * [[Knn.TopKAgg]].
  */
object GroupedTopK {

  /** rows per group by `sortKeys` order; adds `group_rank` (1..k). */
  def apply(df: DataFrame, groupKeys: Seq[Column], sortKeys: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupKeys: _*).orderBy(sortKeys: _*)
    df.withColumn("group_rank", row_number().over(w))
      .filter(col("group_rank") <= k)
  }
}
