package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE posting-table compaction protocol, shared by every
  * bucket-partitioned posting family (trigram FTS, per-key metadata
  * inverted — same `(bucket, <term>, docs)` layout): incremental
  * maintenance appends one row per (term, micro-batch), fragmenting a
  * term's doc list without bound; this folds the table back to ONE row
  * per (bucket, term) and swaps it in atomically. The crash-safety
  * choreography lives HERE exactly once — heal a crashed prior swap,
  * keep the `batch=-1` synthetic leaf so the next append's partition
  * discovery stays conflict-free, and ship the max-folded-batch marker
  * INSIDE the atomic rename (the replay-duplication guard,
  * `EventStream.idempotentAppend`). Run on the compaction cadence, not
  * per batch.
  */
object PostingTables {

  def compact(spark: SparkSession, dir: String, termCol: String): Unit = {
    val tmp = s"${dir}_compacting"
    graft.sources.CollectionStore.healSwap(dir) // crashed prior swap
    val df = spark.read.parquet(dir)
    // maintained dirs carry a batch=<id> partition level (idempotent
    // appends) — compacted rows keep it as a synthetic batch=-1 so the
    // next append's partition discovery stays conflict-free
    val sub = if (df.columns.contains("batch")) "/batch=-1" else ""
    df.groupBy("bucket", termCol)
      .agg(array_sort(array_distinct(flatten(collect_list(col("docs")))))
        .as("docs"))
      .repartition(col("bucket")) // one writer per bucket → no tiny files
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(tmp + sub)
    // max-folded-batch marker rides the atomic swap (replay-dup guard)
    graft.streaming.EventStream.recordFoldedMaxBatch(dir, tmp)
    graft.sources.CollectionStore.swapDirectory(dir, tmp)
    // drop memoized file listings for the swapped directory
    graft.sources.CollectionStore.invalidateRoot(dir)
  }
}
