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

  /** Bucket count for a posting build, derived from the corpus row count
    * instead of a constant (guide §2: partitioning must be
    * scale-adaptive): ~64k records per bucket directory, floored at 4
    * (don't scatter a small corpus over 32-64 near-empty directories —
    * each costs a file create/commit round at build and a listing entry
    * forever) and capped at 4096 (directory-count sanity). At 100 TB the
    * count GROWS with the corpus, keeping per-probe reads bounded, where
    * the old constants (32/64) would have made bucket files arbitrarily
    * large.
    */
  def adaptiveBuckets(n: Long): Int =
    math.min(4096L, math.max(4L, n / 65536L + 4L)).toInt

  /** Self-describing bucket count: builds persist the count they hashed
    * with as `_nbuckets` INSIDE the posting directory, and path-based
    * readers resolve it from there (falling back to the caller's value
    * for pre-sidecar or stream-appended tables). This is what lets the
    * build side scale the count with data without every probe site
    * having to re-derive the same number.
    */
  def writeBucketCount(dir: String, n: Int): Unit = {
    graft.sources.MetaIO.write(s"$dir/_nbuckets", n.toString)
    bucketMemo.put(dir, n)
    ()
  }

  /** The directory's persisted bucket count, or `default` when the table
    * carries no sidecar. Memoized per path — probes must not pay a file
    * read per query. (A rebuild under the same path goes through
    * [[writeBucketCount]], which refreshes the memo in this JVM; a
    * rebuild by ANOTHER JVM is caught at the established invalidation
    * point — `CollectionStore.invalidateRoot` drops matching memo
    * entries via [[invalidateMemo]].)
    */
  def bucketCount(dir: String, default: Int): Int =
    bucketMemo.getOrElseUpdate(dir,
      graft.sources.MetaIO.read(s"$dir/_nbuckets")
        .map(_.trim.toInt).getOrElse(default))

  /** Drop memoized bucket counts under `root` — wired into
    * `CollectionStore.invalidateRoot` so the hashing metadata refreshes
    * at the same point the listing/DF memos do.
    */
  def invalidateMemo(root: String): Unit =
    bucketMemo.keys.filter(_.startsWith(root)).foreach(bucketMemo.remove)

  private val bucketMemo =
    scala.collection.concurrent.TrieMap[String, Int]()

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
    // the bucket-count sidecar describes the HASHING, which the fold
    // preserves — carry it through the swap. MetaIO.copy OVERWRITES: a
    // crash between this copy and swapDirectory leaves tmp/_nbuckets
    // behind, and the retry must not throw FileAlreadyExists (the
    // documented heal-and-retry recovery would otherwise brick)
    graft.sources.MetaIO.copy(s"$dir/_nbuckets", s"$tmp/_nbuckets")
    graft.sources.CollectionStore.swapDirectory(dir, tmp)
    // drop memoized file listings for the swapped directory
    graft.sources.CollectionStore.invalidateRoot(dir)
  }
}
