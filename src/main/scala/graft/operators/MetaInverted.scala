package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key metadata INVERTED index serving — the reference's
  * string/int/float/bool inverted indexes, one per schema-enabled key
  * (`rust/types/src/collection_schema.rs:696-873` per-key `ValueTypes`,
  * writers in `rust/segment/src/blockfile_metadata.rs:1508-1559`, which
  * consult `is_metadata_type_index_enabled` before indexing a value).
  *
  * Layout mirrors the trigram FTS table ([[Fts]]): one posting row per
  * distinct value — `(bucket, value, docs ARRAY<LONG>)` under
  * `<root>/meta_inverted/<key>/postings`, **partitioned by
  * `bucket = pmod(xxhash64(value), nBuckets)`** — so an equality probe
  * computes its bucket DRIVER-SIDE and prunes to one partition directory
  * at PLAN time (`PartitionFilters`, gated in CollectionConfigSpec), the
  * blockfile point-lookup's seek shape. At 100 TB the probe reads one
  * directory's posting rows, never the corpus.
  *
  * Values render CANONICALLY per declared type, with the SAME promotion
  * [[graft.model.Where]] applies at compile time (int/float promote to
  * double and check both typed maps), so index probe and scan predicate
  * can never disagree on representation.
  */
object MetaInverted {

  val DefaultBuckets = 32

  /** The canonical string rendering of `key`'s value in a shredded
    * record frame, per declared type — the indexed TERM. Column-aware:
    * a streaming maintenance source carries only its key's typed map,
    * so the numeric promotion coalesces over the maps PRESENT.
    */
  def valueCol(records: DataFrame, key: String,
      vtype: graft.sources.Catalog.ValueType)
      : org.apache.spark.sql.Column = {
    import graft.sources.Catalog._
    vtype match {
      case VString => element_at(col("meta_str"), key)
      case VBool => element_at(col("meta_bool"), key).cast("string")
      // numeric: the Where compiler's promoted-double semantics
      case VInt | VFloat =>
        val pieces = Seq(
          "meta_int" -> ((c: org.apache.spark.sql.Column) =>
            c.cast("double")),
          "meta_float" -> ((c: org.apache.spark.sql.Column) => c))
          .filter { case (n, _) => records.columns.contains(n) }
          .map { case (n, f) => f(element_at(col(n), key)) }
        require(pieces.nonEmpty,
          s"no numeric metadata column present for key '$key'")
        coalesce(pieces: _*).cast("string")
      case other => throw new IllegalArgumentException(
        s"no inverted index for value type ${other.name}")
    }
  }

  /** Driver-side rendering of a Where literal into the same canonical
    * term [[valueCol]] produces — Spark's double→string formatting is
    * Java's `Double.toString`, so the promotion matches bit-for-bit.
    */
  def renderValue(v: graft.model.Where.Value): String = v match {
    case graft.model.Where.VStr(s) => s
    case graft.model.Where.VBool(b) => b.toString
    case graft.model.Where.VInt(i) => i.toDouble.toString
    case graft.model.Where.VFloat(f) => f.toString
  }

  /** `(offset_id, value)` index-term rows of one key: scalar keys one
    * row per record, array keys one row per ELEMENT — the reference
    * writes each array element into the same posting lists
    * (`rust/index/src/metadata/types.rs:51-121`; `ContainsOperator`
    * membership, `rust/types/src/metadata.rs:2169`), which is what lets
    * `$contains` serve index-first like `$eq`.
    */
  def valueRows(records: DataFrame, key: String,
      vtype: graft.sources.Catalog.ValueType): DataFrame = {
    import graft.sources.Catalog._
    // array elements render through the SAME canonical term rules as
    // scalars: strings raw, bools toString, numerics promoted to double
    // (`Where.arrLookup` casts int/float arrays to array<double>), so
    // index probe and scan predicate agree on representation
    def elems(colName: String, render: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column) =
      records.select(col("offset_id"),
        explode(element_at(col(colName), key)).as("elem"))
        .select(col("offset_id"), render(col("elem")).as("value"))
        .filter(col("value").isNotNull)
    vtype match {
      case VStringArray => elems("meta_str_arr", identity)
      case VIntArray => elems("meta_int_arr",
        _.cast("double").cast("string"))
      case VFloatArray => elems("meta_float_arr", _.cast("string"))
      case VBoolArray => elems("meta_bool_arr", _.cast("string"))
      case _ =>
        records.select(col("offset_id"),
          valueCol(records, key, vtype).as("value"))
          .filter(col("value").isNotNull)
    }
  }

  /** Posting rows of one key over a shredded record frame. */
  def postings(records: DataFrame, key: String,
      vtype: graft.sources.Catalog.ValueType,
      nBuckets: Int = DefaultBuckets): DataFrame =
    valueRows(records, key, vtype)
      .withColumn("bucket",
        pmod(xxhash64(col("value")), lit(nBuckets)).cast("int"))
      .groupBy("bucket", "value")
      .agg(sort_array(collect_list(col("offset_id"))).as("docs"))

  def tableDir(root: String, key: String): String =
    s"$root/meta_inverted/" +
      java.net.URLEncoder.encode(key, "UTF-8") + "/postings"

  /** Build + persist the posting table — compaction-time, once per
    * segment version (the [[graft.sources.CollectionStore]] marker
    * protocol wraps this).
    */
  def buildAndSave(records: DataFrame, root: String, key: String,
      vtype: graft.sources.Catalog.ValueType,
      nBuckets: Int = DefaultBuckets): Unit = {
    postings(records, key, vtype, nBuckets)
      .repartition(col("bucket")) // one writer per bucket → no tiny files
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(tableDir(root, key))
    // self-describing hashing: path-based probes resolve the count from
    // the sidecar, so the build can scale it with the corpus
    PostingTables.writeBucketCount(tableDir(root, key), nBuckets)
  }

  /** Same driver-side bucket hash as the build (xxhash64 seed 42). */
  private def bucketOf(value: String, nBuckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(value),
      org.apache.spark.sql.types.StringType, 42L)
    val m = h % nBuckets
    (if (m < 0) m + nBuckets else m).toInt
  }

  /** Candidate offset_ids matching ANY of `values` on `key` — bucket ids
    * are literal IN-filters → static partition pruning to ≤|values|
    * directories at plan time.
    */
  def candidateIds(spark: SparkSession, root: String, key: String,
      values: Seq[String], nBuckets: Int = DefaultBuckets): DataFrame =
    candidatesFromTable(
      graft.sources.CollectionStore.readCached(spark, tableDir(root, key)),
      values,
      // the persisted table knows its own hashing (`_nbuckets` sidecar);
      // the param is the fallback for pre-sidecar/stream-appended tables
      PostingTables.bucketCount(tableDir(root, key), nBuckets))

  /** Posting compaction for a STREAM-MAINTAINED table (`tableDir` from
    * [[graft.streaming.EventStream.metaInvertedMaintain]]): incremental
    * appends leave one row per (value, micro-batch), fragmenting a
    * value's doc list without bound — fold back to ONE row per
    * (bucket, value), swapped in atomically with the max-folded-batch
    * marker riding the rename (the replay-duplication guard), the same
    * protocol as [[Fts.compactPostings]]. Run on the compaction
    * cadence, not per batch.
    */
  def compactTable(spark: SparkSession, dir: String): Unit =
    PostingTables.compact(spark, dir, "value")

  /** Same probe against any posting TABLE frame (compaction-built or
    * stream-appended `batch=`-leaved — a value's doc lists may be split
    * across per-batch rows; the explode+distinct merges them, the same
    * robustness contract as the FTS posting read).
    */
  def candidatesFromTable(table: DataFrame, values: Seq[String],
      nBuckets: Int = DefaultBuckets): DataFrame = {
    val buckets = values.map(bucketOf(_, nBuckets)).distinct
    table
      .filter(col("bucket").isin(buckets: _*) &&
        col("value").isin(values: _*))
      .select(explode(col("docs")).as("offset_id"))
      .distinct()
  }
}
