package graft.api

import graft.model.Where
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's published quota envelope, enforced at the API edge —
  * `docs/mintlify/cloud/quotas-limits.mdx:13-35` is the whole table, one
  * [[Limits]] field per published row (the `UsageType` enum in
  * `rust/frontend/src/quota/mod.rs:247-271` is the same inventory), with
  * per-record shape rules from `rust/types/src/validators.rs`.
  *
  * Validation is driver-side metadata math (an AST walk, a length check)
  * or ONE aggregate over an arriving write batch (which quota already
  * bounds to 300 records) — it never scans the collection, so
  * enforcement cost is constant at any corpus size. Collections default
  * to [[Quotas.Unlimited]] (the single-node reference enforces nothing);
  * pass [[Quotas.CloudDefaults]] to a [[CollectionHandle]] to run under
  * the published envelope.
  */
object Quotas {

  final case class Limits(
      maxDim: Int,
      maxBatchRecords: Int,
      maxWherePredicates: Int,
      maxRegexBytes: Int,
      maxResults: Int,
      maxRecordsPerCollection: Long,
      maxDocumentBytes: Int = Int.MaxValue,
      maxUriBytes: Int = Int.MaxValue,
      maxIdBytes: Int = Int.MaxValue,
      maxNameBytes: Int = Int.MaxValue,
      maxMetaKeyBytes: Int = Int.MaxValue,
      maxRecordMetaValueBytes: Int = Int.MaxValue,
      maxCollectionMetaValueBytes: Int = Int.MaxValue,
      maxRecordMetaKeys: Int = Int.MaxValue,
      maxCollectionMetaKeys: Int = Int.MaxValue,
      maxConcurrentReads: Int = Int.MaxValue,
      maxConcurrentWrites: Int = Int.MaxValue,
      maxCollections: Long = Long.MaxValue,
      maxForkEdges: Int = Int.MaxValue,
      maxQueryEmbeddings: Int = Int.MaxValue,
      maxSearchPayloads: Int = Int.MaxValue) {
    /** Any per-record shape rule active → the write path pays one batch
      * aggregate; all unlimited → job-free.
      */
    def recordShapesLimited: Boolean =
      maxDocumentBytes != Int.MaxValue || maxUriBytes != Int.MaxValue ||
        maxIdBytes != Int.MaxValue || maxMetaKeyBytes != Int.MaxValue ||
        maxRecordMetaValueBytes != Int.MaxValue ||
        maxRecordMetaKeys != Int.MaxValue
  }

  /** quotas-limits.mdx:13-35 values, row by row. */
  val CloudDefaults: Limits = Limits(
    maxDim = 4096,                        // Maximum embedding dimensions
    maxBatchRecords = 300,                // Maximum records per write
    maxWherePredicates = 8,               // Maximum where predicates
    maxRegexBytes = 256,                  // Maximum FTS/regex search size
    maxResults = 300,                     // Maximum results returned
    maxRecordsPerCollection = 5000000L,   // Maximum records per collection
    maxDocumentBytes = 16384,             // Maximum document bytes
    maxUriBytes = 256,                    // Maximum URI bytes
    maxIdBytes = 128,                     // Maximum ID size bytes
    maxNameBytes = 128,                   // Maximum database/collection name bytes
    maxMetaKeyBytes = 36,                 // Maximum metadata key size bytes
    maxRecordMetaValueBytes = 8182,       // Maximum record metadata value bytes
    maxCollectionMetaValueBytes = 256,    // Maximum collection metadata value bytes
    maxRecordMetaKeys = 32,               // Maximum record metadata keys
    maxCollectionMetaKeys = 32,           // Maximum collection metadata keys
    maxConcurrentReads = 10,              // Maximum concurrent reads per collection
    maxConcurrentWrites = 10,             // Maximum concurrent writes per collection
    maxCollections = 1000000L,            // Maximum collections
    maxForkEdges = 256,                   // Maximum fork edges from root
    // enforcer-internal defaults (not in the published table):
    // `rust/frontend/src/quota/mod.rs:386,393` — both bound the
    // per-request KNN fan-out, i.e. the N in the N×k result collect
    maxQueryEmbeddings = 20,              // Number of query embeddings
    maxSearchPayloads = 5)                // Search payloads per request

  val Unlimited: Limits = Limits(Int.MaxValue, Int.MaxValue, Int.MaxValue,
    Int.MaxValue, Int.MaxValue, Long.MaxValue)

  final class QuotaExceeded(what: String, actual: Long, limit: Long)
    extends IllegalArgumentException(
      s"quota exceeded: $what = $actual over limit $limit")

  private def check(what: String, actual: Long, limit: Long): Unit =
    if (actual > limit) throw new QuotaExceeded(what, actual, limit)

  /** Leaf predicates in a Where tree ($and/$or are connectives, not
    * predicates — the reference counts the leaves of the wire filter).
    */
  def predicateCount(w: Where.Expr): Int = w match {
    case Where.And(cs) => cs.map(predicateCount).sum
    case Where.Or(cs) => cs.map(predicateCount).sum
    case _ => 1
  }

  /** Longest FTS/regex needle in the tree, in UTF-8 bytes. */
  private def maxNeedleBytes(w: Where.Expr): Int = w match {
    case Where.And(cs) => (0 +: cs.map(maxNeedleBytes)).max
    case Where.Or(cs) => (0 +: cs.map(maxNeedleBytes)).max
    case Where.DocContains(s, _) => s.getBytes("UTF-8").length
    case Where.DocRegex(p, _) => p.getBytes("UTF-8").length
    case _ => 0
  }

  def validateWhere(w: Where.Expr, limits: Limits): Unit = {
    check("where predicates per query", predicateCount(w).toLong,
      limits.maxWherePredicates.toLong)
    check("FTS/regex query bytes", maxNeedleBytes(w).toLong,
      limits.maxRegexBytes.toLong)
  }

  def validateBatch(nRecords: Long, limits: Limits): Unit =
    check("records per write batch", nRecords, limits.maxBatchRecords.toLong)

  def validateDim(dim: Int, limits: Limits): Unit =
    check("embedding dimensions", dim.toLong, limits.maxDim.toLong)

  def validateResults(k: Int, limits: Limits): Unit =
    check("results per query", k.toLong, limits.maxResults.toLong)

  def validateQueryEmbeddings(n: Int, limits: Limits): Unit =
    check("query embeddings per request", n.toLong,
      limits.maxQueryEmbeddings.toLong)

  def validateSearchPayloads(n: Int, limits: Limits): Unit =
    check("search payloads per request", n.toLong,
      limits.maxSearchPayloads.toLong)

  def validateCollectionSize(nRecords: Long, limits: Limits): Unit =
    check("records per collection", nRecords, limits.maxRecordsPerCollection)

  /** Per-record shape rules over an arriving write batch — ONE aggregate
    * (the batch is already quota-bounded to `maxBatchRecords`), computing
    * the batch maxima of every limited dimension at once: id bytes,
    * document bytes, uri bytes, metadata key count, metadata key bytes,
    * metadata value bytes. Runs on the RAW user batch (before the
    * facade's reserved-key/typed-tag encodes, which would inflate the
    * user-visible sizes the reference validates). Metadata key count and
    * key size cover the TYPED maps too (`meta_int`/`meta_float`/
    * `meta_bool` — a record's keys are one dictionary in the reference,
    * however they are typed); value size applies to string values (the
    * typed scalars have fixed width).
    */
  def validateRecordShapes(records: DataFrame, limits: Limits): Unit = {
    if (!limits.recordShapesLimited) return
    val metaCols = Seq("meta", "meta_int", "meta_float", "meta_bool")
      .filter(records.columns.contains)
    def has(c: String) = records.columns.contains(c)
    val zero = lit(0)
    def keyCount: org.apache.spark.sql.Column =
      if (metaCols.isEmpty) zero
      else metaCols.map(c => coalesce(size(map_keys(col(c))), lit(0)))
        .reduce(_ + _)
    def maxKeyBytes: org.apache.spark.sql.Column =
      if (metaCols.isEmpty) zero
      else greatest(lit(0) +: metaCols.map(c =>
        coalesce(array_max(transform(map_keys(col(c)),
          k => octet_length(k))), lit(0))): _*)
    val metrics = Seq(
      "ID size bytes" ->
        (if (has("id")) max(octet_length(col("id").cast("string"))) else max(zero)),
      "document bytes" ->
        (if (has("document")) max(octet_length(col("document"))) else max(zero)),
      "URI bytes" ->
        (if (has("uri")) max(octet_length(col("uri"))) else max(zero)),
      "record metadata keys" -> max(keyCount),
      "metadata key size bytes" -> max(maxKeyBytes),
      "record metadata value size bytes" ->
        (if (has("meta"))
          max(array_max(transform(map_values(col("meta")), v => octet_length(v))))
        else max(zero)))
    val row = records.agg(metrics.head._2, metrics.tail.map(_._2): _*).head()
    def got(i: Int): Long = if (row.isNullAt(i)) 0L else row.getInt(i).toLong
    check(metrics(0)._1, got(0), limits.maxIdBytes.toLong)
    check(metrics(1)._1, got(1), limits.maxDocumentBytes.toLong)
    check(metrics(2)._1, got(2), limits.maxUriBytes.toLong)
    check(metrics(3)._1, got(3), limits.maxRecordMetaKeys.toLong)
    check(metrics(4)._1, got(4), limits.maxMetaKeyBytes.toLong)
    check(metrics(5)._1, got(5), limits.maxRecordMetaValueBytes.toLong)
  }

  /** Database/collection name rules under quota — the byte cap is the
    * published 128 (`quotas-limits.mdx:19-20`); the SHAPE rules are the
    * reference frontend's `validate_name` (`rust/types/src/
    * validators.rs:44-100`): 3..512 chars, `[A-Za-z0-9._-]` with
    * alphanumeric first/last, no `..`, and not an IP address (names are
    * DNS-adjacent in the reference's routing). Unlimited collections keep
    * the catalog's relaxed structural check only.
    */
  def validateName(name: String, what: String, limits: Limits): Unit = {
    if (limits.maxNameBytes == Int.MaxValue) return
    check(s"$what name bytes", name.getBytes("UTF-8").length.toLong,
      limits.maxNameBytes.toLong)
    def bad(msg: String) = throw new QuotaExceeded(
      s"$what name '$name' invalid: $msg", name.length.toLong, 0L)
    // the reference accepts `topology+name` (a single '+' splitting two
    // independently-valid names, combined length still <= 512 —
    // `validators.rs:44-71` recurses after rejecting a second '+')
    val plus = name.indexOf('+')
    if (plus >= 0) {
      if (name.length > 512) bad("expected 3-512 characters")
      val (topo, rest) = (name.substring(0, plus), name.substring(plus + 1))
      if (rest.contains('+'))
        bad("expected at most one topology: got two '+' characters")
      validateShape(topo, bad)
      validateShape(rest, bad)
      return
    }
    validateShape(name, bad)
  }

  private def validateShape(name: String,
      bad: String => Nothing): Unit = {
    if (name.length < 3 || name.length > 512)
      bad("expected 3-512 characters")
    if (!name.matches("[a-zA-Z0-9][a-zA-Z0-9._-]*[a-zA-Z0-9]"))
      bad("must be [a-zA-Z0-9._-] with alphanumeric first/last characters")
    if (name.contains("..")) bad("must not contain '..'")
    val ipv4 = name.matches("\\d{1,3}(\\.\\d{1,3}){3}")
    if (ipv4) bad("must not be an IP address")
  }

  def validateCollectionMeta(meta: Map[String, String],
      limits: Limits): Unit = {
    check("collection metadata keys", meta.size.toLong,
      limits.maxCollectionMetaKeys.toLong)
    meta.keys.foreach(k => check("metadata key size bytes",
      k.getBytes("UTF-8").length.toLong, limits.maxMetaKeyBytes.toLong))
    meta.values.foreach(v => check("collection metadata value size bytes",
      v.getBytes("UTF-8").length.toLong,
      limits.maxCollectionMetaValueBytes.toLong))
  }

  def validateCollectionCount(n: Long, limits: Limits): Unit =
    check("collections", n, limits.maxCollections)

  def validateForkEdges(n: Long, limits: Limits): Unit =
    check("fork edges from root", n, limits.maxForkEdges.toLong)

  /** Per-collection concurrent-operation admission — the published
    * "maximum concurrent reads/writes per collection" rows. The reference
    * enforces these service-side per collection; the in-process analog is
    * a JVM-wide permit table keyed by the collection's data root. A
    * request past the cap REJECTS (the reference returns a quota error,
    * it does not queue).
    */
  object Gates {
    private val permits =
      new java.util.concurrent.ConcurrentHashMap[String,
        java.util.concurrent.Semaphore]()
    private def gate(key: String, n: Int) =
      permits.computeIfAbsent(key,
        _ => new java.util.concurrent.Semaphore(n, true))

    // REENTRANT per thread: one logical read that composes gated
    // entry points (search → query, queryText → query) counts as ONE
    // admitted request, never two permits — nesting under a full gate
    // must not self-reject
    private val held = ThreadLocal.withInitial(
      () => scala.collection.mutable.Set[String]())

    def withPermit[T](key: String, kind: String, cap: Int)(f: => T): T = {
      if (cap == Int.MaxValue) return f
      val gk = s"$kind:$key"
      if (held.get.contains(gk)) return f
      val g = gate(gk, cap)
      if (!g.tryAcquire())
        throw new QuotaExceeded(s"concurrent ${kind}s per collection",
          cap.toLong + 1, cap.toLong)
      held.get += gk
      try f finally { held.get -= gk; g.release() }
    }
    def withRead[T](key: String, limits: Limits)(f: => T): T =
      withPermit(key, "read", limits.maxConcurrentReads)(f)
    def withWrite[T](key: String, limits: Limits)(f: => T): T =
      withPermit(key, "write", limits.maxConcurrentWrites)(f)
  }
}
