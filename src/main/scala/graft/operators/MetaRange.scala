package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key VALUE-ORDERED metadata postings — the range-scan leg of the
  * reference's per-key inverted indexes: blockfile metadata keys are
  * stored sorted by (key, value), so `$gt/$gte/$lt/$lte` serve as range
  * scans over the sorted prefix (`rust/index/src/metadata/types.rs:580-676`
  * — the rank/forward/backward range readers). The hash-bucketed
  * [[MetaInverted]] layout cannot range-scan (a value's bucket says
  * nothing about its order), so range predicates get this SECOND layout.
  *
  * Spark-first shape: the posting table range-partitions on the value —
  * `repartitionByRange` (sampled equal-frequency boundaries, ties never
  * split) — and persists under `<root>/meta_range/<key>/postings`,
  * **partitioned by the range-bucket id** with a tiny sidecar `bounds`
  * table (one `(rbucket, lo, hi)` row per bucket, the blockfile's sparse
  * index). A range probe reads the bounds DRIVER-side (nBuckets rows),
  * keeps only the buckets whose [lo, hi] intersects the query range, and
  * issues a literal `rbucket IN (...)` — static partition pruning at
  * PLAN time, so at 100 TB a narrow range reads ~|range|/|domain| of the
  * index directories, the sorted-key seek shape, never the corpus.
  *
  * Values store PROMOTED like the scan predicate compares them
  * ([[graft.model.Where]] `lookup`): int/float promote to double over
  * both typed maps; strings stay strings and bucket-prune compares
  * UTF-8 bytes (Spark's string ordering) — probe and scan can never
  * disagree on order. Exactness: the in-bucket filter re-applies the
  * exact range predicate, so bounds only PRUNE (a kept bucket still
  * filters row-by-row) and the caller's prefilter-then-verify contract
  * holds — the full predicate always verifies on the joined view.
  */
object MetaRange {

  val DefaultBuckets = 32

  /** Rows per (value, chunk) posting row — a hot value (half the corpus
    * sharing one flag) must not fold into a single giant `docs` array in
    * one task; chunking by offset range bounds every row while the
    * probe's explode+distinct is insensitive to the split (same
    * robustness contract as the stream-appended [[MetaInverted]] reads).
    */
  val ChunkSpan: Long = 1L << 22

  /** The ordered value of `key` in a shredded record frame, per declared
    * type: double for numeric keys (the Where compiler's promoted-double
    * semantics over both typed maps), string for string keys.
    */
  def valueCol(records: DataFrame, key: String,
      vtype: graft.sources.Catalog.ValueType): Column = {
    import graft.sources.Catalog._
    vtype match {
      case VString => element_at(col("meta_str"), key)
      case VInt | VFloat => coalesce(
        element_at(col("meta_int"), key).cast("double"),
        element_at(col("meta_float"), key))
      case other => throw new IllegalArgumentException(
        s"no range index for value type ${other.name}")
    }
  }

  def tableDir(root: String, key: String): String =
    s"$root/meta_range/" +
      java.net.URLEncoder.encode(key, "UTF-8") + "/postings"
  def boundsDir(root: String, key: String): String =
    s"$root/meta_range/" +
      java.net.URLEncoder.encode(key, "UTF-8") + "/bounds"

  /** Build + persist the value-ordered posting table and its bounds
    * sidecar — compaction-time, once per segment version (the
    * [[graft.sources.CollectionStore]] marker protocol wraps this).
    * Bounds compute from the WRITTEN postings (one skinny re-read), so
    * they describe exactly what pruning will read — immune to any
    * re-evaluation drift in the bucket assignment upstream.
    */
  def buildAndSave(records: DataFrame, root: String, key: String,
      vtype: graft.sources.Catalog.ValueType,
      nBuckets: Int = DefaultBuckets,
      chunkSpan: Long = ChunkSpan): Unit = {
    val spark = records.sparkSession
    val vals = records
      .select(col("offset_id"), valueCol(records, key, vtype).as("value"))
      .filter(col("value").isNotNull)
    val bucketed = vals
      .repartitionByRange(nBuckets, col("value"))
      .withColumn("rbucket", spark_partition_id())
    bucketed
      .groupBy(col("rbucket"), col("value"),
        floor(col("offset_id") / chunkSpan).as("chunk"))
      .agg(sort_array(collect_list(col("offset_id"))).as("docs"))
      .repartition(col("rbucket")) // one writer per bucket → no tiny files
      .write.mode(SaveMode.Overwrite)
      .partitionBy("rbucket")
      .parquet(tableDir(root, key))
    // skinny scan: rbucket comes from the directory, value is one column
    spark.read.parquet(tableDir(root, key))
      .groupBy(col("rbucket"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(boundsDir(root, key))
  }

  /** One conjunctive range constraint: `value <op> bound` with
    * `op ∈ {$gt, $gte, $lt, $lte}` and `bound` already rendered to the
    * layout's value type (java.lang.Double for numeric keys, String for
    * string keys).
    */
  final case class Leaf(op: String, bound: Any)

  /** Spark's ordering, driver-side: doubles via j.l.Double.compare (NaN
    * greatest, matching Spark's), strings via unsigned UTF-8 byte
    * comparison (UTF8String.binaryCompare — Java's compareTo differs on
    * supplementary characters, which would mis-prune).
    */
  private[graft] def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.compare(x, y)
    case (x: String, y: String) =>
      val xa = x.getBytes("UTF-8"); val ya = y.getBytes("UTF-8")
      var i = 0
      val n = math.min(xa.length, ya.length)
      while (i < n) {
        val d = (xa(i) & 0xff) - (ya(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      xa.length - ya.length
    case other => throw new IllegalArgumentException(
      s"range bound type mismatch: $other")
  }

  /** May a bucket with value span [lo, hi] contain a value satisfying
    * `leaf`? Conservative by construction (bounds are exact min/max of
    * the bucket's stored values).
    */
  private def mayMatch(lo: Any, hi: Any, leaf: Leaf): Boolean = leaf.op match {
    case "$gt"  => cmp(hi, leaf.bound) > 0
    case "$gte" => cmp(hi, leaf.bound) >= 0
    case "$lt"  => cmp(lo, leaf.bound) < 0
    case "$lte" => cmp(lo, leaf.bound) <= 0
    case other => throw new IllegalArgumentException(s"not a range op: $other")
  }

  private def litOf(bound: Any): Column = bound match {
    case d: java.lang.Double => lit(d.doubleValue())
    case s: String => lit(s)
    case other => throw new IllegalArgumentException(s"bad bound $other")
  }

  /** Candidate offset_ids satisfying ALL of `leaves` on `key`: bounds
    * read driver-side → literal `rbucket IN` → plan-time partition
    * pruning; the exact conjunction re-filters inside the kept buckets.
    */
  def candidateIds(spark: SparkSession, root: String, key: String,
      leaves: Seq[Leaf]): DataFrame = {
    require(leaves.nonEmpty, "range probe needs >= 1 leaf")
    val bounds = graft.sources.CollectionStore
      .readCached(spark, boundsDir(root, key))
      .select(col("rbucket"), col("lo"), col("hi")).collect()
    val keep = bounds.collect {
      case r if leaves.forall(l => mayMatch(r.get(1), r.get(2), l)) =>
        r.getInt(0)
    }.toSeq
    val table = graft.sources.CollectionStore
      .readCached(spark, tableDir(root, key))
    val pred = leaves.map { l =>
      val v = col("value")
      l.op match {
        case "$gt" => v > litOf(l.bound)
        case "$gte" => v >= litOf(l.bound)
        case "$lt" => v < litOf(l.bound)
        case "$lte" => v <= litOf(l.bound)
      }
    }.reduce(_ && _)
    table
      .filter(col("rbucket").isin(keep: _*) && pred)
      .select(explode(col("docs")).as("offset_id"))
      .distinct()
  }
}
