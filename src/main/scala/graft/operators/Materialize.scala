package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** MaterializeLogs — the reference's log-vs-segment merge
  * (`rust/segment/src/types.rs:143-716`) with the operation state machine of
  * `rust/types/src/operation.rs:16-34`:
  *
  *   - `Add`: insert iff the id is not currently live (duplicate Add is a
  *     no-op); Add after Delete in the same log = `OverwriteExisting`.
  *   - `Upsert`: insert or full overwrite (document + metadata replaced).
  *   - `Update`: merge into the live record — document replaced only when
  *     provided, metadata keys merged — no-op when the id is not live.
  *   - `Delete`: remove (`DeleteExisting`).
  *
  * Ordering is by **log offset** (the WAL's total order per collection),
  * never by timestamp.
  *
  * Spark shape: one shuffle on `id`, then a per-id in-memory fold
  * (`groupByKey.flatMapGroups`). Per-id op counts are bounded by write
  * activity between compactions, so group state stays tiny at any scale;
  * the compacted segment enters the same fold as offset -inf pseudo-Adds,
  * exactly the reference's `SourceRecordSegment` rebuild path
  * (`operators/source_record_segment.rs`).
  */
object Materialize {

  /** One WAL record (FIXTURES.md §2; `rust/types/src/record.rs`). */
  case class LogOp(
      id: String,
      log_offset: Long,
      op: String, // Add | Update | Upsert | Delete
      document: Option[String],
      meta: Map[String, String])

  /** A materialized record. */
  case class Rec(id: String, document: Option[String], meta: Map[String, String])

  /** A null metadata VALUE is a tombstone: in Update it removes the key
    * from the live record (the reference's `UpdateMetadataValue::None`,
    * `rust/types/src/metadata.rs` update semantics); in Add/Upsert a
    * null-valued key is simply absent.
    */
  private def fold(ops: Iterator[LogOp]): Iterator[Rec] = {
    val sorted = ops.toSeq.sortBy(_.log_offset)
    var cur: Option[Rec] = None
    sorted.foreach { o =>
      o.op match {
        case "Add" =>
          if (cur.isEmpty) cur = Some(Rec(o.id, o.document, o.meta.filter(_._2 != null)))
        case "Upsert" =>
          cur = Some(Rec(o.id, o.document, o.meta.filter(_._2 != null)))
        case "Update" =>
          cur = cur.map { c =>
            val (dels, sets) = o.meta.partition(_._2 == null)
            Rec(c.id,
              if (o.document.isDefined) o.document else c.document,
              (c.meta -- dels.keys) ++ sets)
          }
        case "Delete" =>
          cur = None
        case other => throw new IllegalArgumentException(s"bad op $other")
      }
    }
    cur.iterator
  }

  /** Apply `log` on top of `segment` (both in LogOp shape for the segment:
    * use [[segmentAsLog]]). Returns the live records.
    */
  def apply(spark: SparkSession, log: Dataset[LogOp],
      segment: Option[Dataset[LogOp]] = None): Dataset[Rec] = {
    import spark.implicits._
    val all = segment.map(_.union(log)).getOrElse(log)
    all.groupByKey(_.id).flatMapGroups((_, ops) => fold(ops))
  }

  /** Compacted records as offset −inf pseudo-Adds feeding the same fold. */
  def segmentAsLog(spark: SparkSession, records: Dataset[Rec]): Dataset[LogOp] = {
    import spark.implicits._
    records.map(r => LogOp(r.id, Long.MinValue, "Add", r.document, r.meta))
  }
}
