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
      // numeric: the Where compiler's promoted-double semantics; only
      // the typed columns actually present contribute (a maintenance
      // stream's shredded batch carries just the key's declared column)
      case VInt | VFloat =>
        val pieces = Seq(
          "meta_int" -> ((c: Column) => c.cast("double")),
          "meta_float" -> ((c: Column) => c))
          .filter { case (n, _) => records.columns.contains(n) }
          .map { case (n, f) => f(element_at(col(n), key)) }
        require(pieces.nonEmpty,
          s"no numeric metadata column present for key '$key'")
        coalesce(pieces: _*)
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
  /** Stream-maintained sibling dirs ([[graft.streaming.EventStream
    * .metaRangeMaintain]]): per-batch posting rows routed into the BASE
    * build's fixed bucket ranges, plus the per-batch bounds-widening
    * rows the probe folds back in. Kept apart from the base table so
    * the compaction-time served path never mixes schemas.
    */
  def tableDeltaDir(root: String, key: String): String =
    s"$root/meta_range/" +
      java.net.URLEncoder.encode(key, "UTF-8") + "/postings_delta"
  def boundsDeltaDir(root: String, key: String): String =
    s"$root/meta_range/" +
      java.net.URLEncoder.encode(key, "UTF-8") + "/bounds_delta"

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

  /** Prune + exact in-bucket re-filter + explode, the shared probe core:
    * keep only buckets whose folded [lo, hi] may satisfy every leaf,
    * then re-apply the exact conjunction row-by-row inside them.
    */
  private def probeOver(table: DataFrame,
      bounds: Seq[(Int, Any, Any)], leaves: Seq[Leaf]): DataFrame = {
    require(leaves.nonEmpty, "range probe needs >= 1 leaf")
    val keep = bounds.collect {
      case (rb, lo, hi) if leaves.forall(mayMatch(lo, hi, _)) => rb
    }
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

  private def boundsOf(rows: Array[org.apache.spark.sql.Row])
      : Seq[(Int, Any, Any)] =
    rows.map(r => (r.getInt(0), r.get(1), r.get(2))).toSeq

  /** Candidate offset_ids satisfying ALL of `leaves` on `key`: bounds
    * read driver-side → literal `rbucket IN` → plan-time partition
    * pruning; the exact conjunction re-filters inside the kept buckets.
    * The compaction-time SERVED path — base build only, no deltas.
    */
  def candidateIds(spark: SparkSession, root: String, key: String,
      leaves: Seq[Leaf]): DataFrame = {
    val bounds = boundsOf(graft.sources.CollectionStore
      .readCached(spark, boundsDir(root, key))
      .select(col("rbucket"), col("lo"), col("hi")).collect())
    probeOver(
      graft.sources.CollectionStore.readCached(spark, tableDir(root, key)),
      bounds, leaves)
  }

  /** Route values into the FIXED base bucket ranges: the bucket with the
    * greatest `lo <= v` (values below every lo → bucket of the smallest
    * lo) — an LSM routing new keys into existing sorted runs. rbucket
    * ids ascend with the value ranges (`spark_partition_id` after
    * `repartitionByRange`), so the count-of-los-≤-v expression is the
    * bucket rank; string comparisons use Spark's UTF-8 binary order,
    * the same order [[cmp]] prunes by.
    */
  private[graft] def routeBucket(bounds: Seq[(Int, Any, Any)],
      v: Column): Column = {
    val ordered = bounds.sortBy(_._1)
    // the build's ids are spark_partition_id after repartitionByRange —
    // dense 0..n-1 ascending with the ranges, so the rank IS the id (a
    // flat sum keeps the generated code linear; a nested when-chain
    // trips Janino's method-size limit at 32 buckets)
    require(ordered.map(_._1) == ordered.indices,
      s"rbucket ids must be dense 0..n-1, got ${ordered.map(_._1)}")
    val rank = ordered.map { case (_, lo, _) =>
      when(v >= litOf(lo), 1).otherwise(0) }.reduce(_ + _)
    greatest(rank - lit(1), lit(0))
  }

  /** Posting rows of a record batch routed into the base bucket ranges —
    * the per-batch unit [[graft.streaming.EventStream.metaRangeMaintain]]
    * appends; same (rbucket, value, chunk, docs) shape as the build, so
    * the probe's explode+distinct is insensitive to base/delta splits.
    */
  def postingsInto(batch: DataFrame, key: String,
      vtype: graft.sources.Catalog.ValueType,
      bounds: Seq[(Int, Any, Any)],
      chunkSpan: Long = ChunkSpan): DataFrame =
    batch
      .select(col("offset_id"), valueCol(batch, key, vtype).as("value"))
      .filter(col("value").isNotNull)
      .withColumn("rbucket", routeBucket(bounds, col("value")).cast("int"))
      .groupBy(col("rbucket"), col("value"),
        floor(col("offset_id") / chunkSpan).as("chunk"))
      .agg(sort_array(collect_list(col("offset_id"))).as("docs"))

  /** Base bounds read driver-side (no deltas) — the fixed routing table
    * a maintenance stream closes over.
    */
  def baseBounds(spark: SparkSession, root: String, key: String)
      : Seq[(Int, Any, Any)] =
    boundsOf(spark.read.parquet(boundsDir(root, key))
      .select(col("rbucket"), col("lo"), col("hi")).collect())

  /** Per-bucket bounds folded across the base sidecar and every
    * maintenance delta: lo only falls, hi only rises, so pruning over
    * the fold stays conservative for both halves of the table.
    */
  def foldedBounds(spark: SparkSession, root: String, key: String)
      : Seq[(Int, Any, Any)] = {
    val base = baseBounds(spark, root, key)
    val deltaP = java.nio.file.Paths.get(
      boundsDeltaDir(root, key).stripPrefix("file:"))
    if (!java.nio.file.Files.exists(deltaP)) return base
    val delta = boundsOf(spark.read.parquet(boundsDeltaDir(root, key))
      .select(col("rbucket"), col("lo"), col("hi")).collect())
    (base ++ delta).groupBy(_._1).map { case (rb, bs) =>
      (rb, bs.map(_._2).reduce((a, b) => if (cmp(a, b) <= 0) a else b),
        bs.map(_._3).reduce((a, b) => if (cmp(a, b) >= 0) a else b))
    }.toSeq.sortBy(_._1)
  }

  /** Range candidates over the base build PLUS any stream-maintained
    * deltas: folded bounds prune, base ∪ delta postings re-filter
    * exactly. Uncached reads — the delta table grows on the ingest
    * cadence, and a cached frame would serve stale postings.
    */
  def candidateIdsMaintained(spark: SparkSession, root: String,
      key: String, leaves: Seq[Leaf]): DataFrame = {
    val base = spark.read.parquet(tableDir(root, key))
    val deltaP = java.nio.file.Paths.get(
      tableDeltaDir(root, key).stripPrefix("file:"))
    val table =
      if (!java.nio.file.Files.exists(deltaP)) base
      else base.unionByName(
        spark.read.parquet(tableDeltaDir(root, key)).drop("batch"))
    probeOver(table, foldedBounds(spark, root, key), leaves)
  }

  /** Fold the stream-maintained deltas into the base table and retire
    * them — the ninth family's compaction, the reference rewriting its
    * sorted blockfile on the compaction cadence. Each delta posting row
    * merges into its (rbucket, value, chunk) base row; bounds recompute
    * from the WRITTEN postings; the emptied delta dirs swap in carrying
    * the max-folded-batch marker ([[graft.streaming.EventStream
    * .recordFoldedMaxBatch]]), so a crashed micro-batch replaying after
    * the fold no-ops instead of duplicating. Swap order is crash-safe
    * end to end: base swaps FIRST, so any window where delta rows exist
    * in both tables only feeds duplicates into the probe's
    * explode+distinct, and bounds stay conservative because the not-yet-
    * retired delta bounds keep folding in.
    */
  def compactMaintained(spark: SparkSession, root: String,
      key: String): Unit = {
    import graft.sources.CollectionStore.{healSwap, swapDirectory, invalidateRoot}
    val tDir = tableDir(root, key); val dDir = tableDeltaDir(root, key)
    val bDir = boundsDir(root, key); val bdDir = boundsDeltaDir(root, key)
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dDir.stripPrefix("file:")))) return
    Seq(tDir, dDir, bDir, bdDir).foreach(healSwap)
    val tTmp = s"${tDir}_compacting"
    spark.read.parquet(tDir)
      .unionByName(spark.read.parquet(dDir).drop("batch"))
      .groupBy("rbucket", "value", "chunk")
      .agg(array_sort(array_distinct(flatten(collect_list(col("docs")))))
        .as("docs"))
      .repartition(col("rbucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("rbucket").parquet(tTmp)
    val bTmp = s"${bDir}_compacting"
    spark.read.parquet(tTmp)
      .groupBy(col("rbucket"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(bTmp)
    val dTmp = s"${dDir}_compacting"; val bdTmp = s"${bdDir}_compacting"
    spark.read.parquet(dDir).drop("batch").limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$dTmp/batch=-1")
    spark.read.parquet(bdDir).drop("batch").limit(0)
      .write.mode(SaveMode.Overwrite).parquet(s"$bdTmp/batch=-1")
    graft.streaming.EventStream.recordFoldedMaxBatch(dDir, dTmp)
    graft.streaming.EventStream.recordFoldedMaxBatch(bdDir, bdTmp)
    swapDirectory(tDir, tTmp); invalidateRoot(tDir)
    swapDirectory(bDir, bTmp); invalidateRoot(bDir)
    swapDirectory(dDir, dTmp); invalidateRoot(dDir)
    swapDirectory(bdDir, bdTmp); invalidateRoot(bdDir)
  }
}
