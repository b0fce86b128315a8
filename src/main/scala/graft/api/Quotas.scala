package graft.api

import graft.model.Where

/** The reference's published quota envelope, enforced at the API edge —
  * `docs/mintlify/cloud/quotas-limits.mdx` is the whole table:
  * max embedding dimensions 4,096 (`:15`), max where predicates per
  * query 8 (`:26`), max FTS/regex query bytes 256 (`:27`), max results
  * returned per query 300 (`:28`), max records per collection 5,000,000
  * (`:32`), max records per write batch 300 (`:34`).
  *
  * Validation is driver-side metadata math (an AST walk, a length check)
  * — it never touches the data plane, so enforcement cost is zero at any
  * corpus size. Collections default to [[Quotas.Unlimited]] (the
  * single-node reference enforces nothing); pass [[Quotas.CloudDefaults]]
  * to a [[CollectionHandle]] to run under the published envelope.
  */
object Quotas {

  final case class Limits(
      maxDim: Int,
      maxBatchRecords: Int,
      maxWherePredicates: Int,
      maxRegexBytes: Int,
      maxResults: Int,
      maxRecordsPerCollection: Long)

  /** quotas-limits.mdx values. */
  val CloudDefaults: Limits = Limits(
    maxDim = 4096,
    maxBatchRecords = 300,
    maxWherePredicates = 8,
    maxRegexBytes = 256,
    maxResults = 300,
    maxRecordsPerCollection = 5000000L)

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

  def validateCollectionSize(nRecords: Long, limits: Limits): Unit =
    check("records per collection", nRecords, limits.maxRecordsPerCollection)
}
