package graft.api

import org.apache.spark.sql.DataFrame

/** A conditional commit was rejected: a durable log entry in the
  * validation window `(observed_log_offset, validatedThrough]` touched
  * one of the transaction's read or write ids — the reference's
  * conflict-window rejection (`rust/log-service/src/lib.rs:144-167`:
  * `conflict_ids = read_ids ∪ write_ids`). `ids` lists the conflicting
  * record ids (bounded sample, sorted).
  */
final case class CommitConflict(validatedThrough: Long, ids: Seq[String])

/** `indexing_status` response — op-count split of the durable log at
  * the current compacted segment's walmark (`IndexStatusResponse`,
  * `rust/types/src/api_types.rs:1101-1106`).
  */
final case class IndexingStatus(opIndexingProgress: Double,
    numUnindexedOps: Long, numIndexedOps: Long, totalOps: Long)

/** Optimistic id-scoped transaction — the reference's conditional
  * commit (`service_based_frontend.rs:1859-1990` `conditional_commit_
  * append`): writes buffer client-side and commit to the durable log as
  * ONE entry, if and only if no entry published after
  * `observedLogOffset` touches any of the transaction's read or write
  * ids. The log tier enforces the condition (`rust/log-service/src/
  * lib.rs:229-260` validates the window bounds; the admission predicate
  * rejects on in-flight conflicts), so two racing read-modify-write
  * transactions on the same id can never both commit — one observes the
  * other in its window and rejects.
  *
  * Spark-first shape: buffered writes are DataFrames (the same
  * `withDefaults`-prepared batches the unconditional write path
  * appends), and the commit rides the WAL's claim-first CAS
  * ([[graft.sources.WalStore.appendAt]]): validate the window
  * `(observed, tail]`, then claim position `tail+1`. Winning the claim
  * PROVES the window was complete — no entry can ever publish between
  * the validated prefix and the claimed slot, which is exactly the
  * atomicity the reference gets from its log service's enqueue-time
  * admission predicate. Losing the claim re-validates only the newly
  * published suffix and retries, mirroring the reference's bounded
  * retry-on-backoff loop.
  *
  * A READ-ONLY transaction (no buffered writes, only `trackReads`)
  * commits a FENCE: an empty entry whose claimed position certifies
  * that the reads were still valid when it serialized into the log —
  * readers skip it like a voided slot (count-0 marker, the crash-
  * recovery shape they already handle).
  *
  * One-shot: after `commit` returns (either way), the transaction is
  * finished; on conflict, begin a new one and re-read (the reference
  * client's retry contract).
  */
final class Transaction private[api] (handle: CollectionHandle,
    val observedLogOffset: Long) {

  // (op, prepared batch, driver-known distinct ids) in buffer order —
  // LWW inside the committed entry follows buffer order (each batch
  // gets the next offset rank), the reference's record order within
  // one ConditionalCommitRequest
  private[api] var buffered: Vector[(String, DataFrame, Seq[String])] =
    Vector.empty
  private[api] var readIds: Set[String] = Set.empty
  private var finished = false

  private def open(): Unit =
    require(!finished, "transaction already committed")

  private def checkIds(ids: Seq[String], what: String): Unit =
    require(ids.forall(id => id != null && id.nonEmpty),
      s"$what must not contain empty ids")

  /** Record ids this transaction read (and whose stability the commit
    * asserts) — the request's `read_ids`.
    */
  def trackReads(ids: Seq[String]): this.type = {
    open(); checkIds(ids, "read_ids")
    readIds ++= ids
    this
  }

  /** Read records by id at the handle's current state, recording them as
    * read ids — the read half of a read-modify-write transaction.
    */
  def get(ids: Seq[String],
      include: Seq[String] = Seq("document")): DataFrame = {
    open()
    trackReads(ids)
    handle.get(where = Some(graft.model.Where.IdIn(ids)), include = include)
  }

  private def buffer(records: DataFrame, op: String): this.type = {
    open()
    val (prepared, ids) = handle.prepareTxBatch(records, op)
    checkIds(ids, "records")
    buffered = buffered :+ ((op, prepared, ids))
    this
  }

  def add(records: DataFrame): this.type = buffer(records, "Add")
  def update(records: DataFrame): this.type = buffer(records, "Update")
  def upsert(records: DataFrame): this.type = buffer(records, "Upsert")
  def delete(ids: Seq[String]): this.type = {
    open(); checkIds(ids, "records")
    val spark = handle.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = ids.toDF("id")
      .withColumn("document", lit(null).cast("string"))
      .withColumn("meta",
        map_from_arrays(array(), array()).cast("map<string,string>"))
    buffered = buffered :+ (("Delete", df, ids.distinct))
    this
  }

  /** Every id the commit conflicts on: reads asserted stable plus ids
    * being written (`create_conditional_write_request`,
    * `rust/log-service/src/lib.rs:155-167`).
    */
  private[api] def conflictIds: Set[String] =
    readIds ++ buffered.flatMap(_._3)

  /** Commit the buffered writes conditionally. Right(position) when the
    * entry (or read-only fence) published at `position`; Left(conflict)
    * when an entry in the validation window touched a read or write id —
    * nothing was applied. Throws on unreadable windows (observed offset
    * beyond the tail, or before the GC'd lower bound) and on claim
    * starvation past `timeoutMs`, like the unconditional
    * [[CollectionHandle.commitLog]].
    */
  def commit(timeoutMs: Long = 30000L): Either[CommitConflict, Long] = {
    open()
    finished = true
    handle.commitConditional(this, timeoutMs)
  }
}
