package graft.api

/** Read-consistency level of a collection read — the reference's
  * `ReadLevel` (`rust/types/src/execution/plan.rs:550-565`), carried on
  * every read plan's Scan:
  *
  *  - [[ReadLevel.IndexAndWal]] (default): index + full write-ahead log —
  *    every committed write visible (read-your-writes).
  *  - [[ReadLevel.IndexOnly]]: the compacted segment only — eventual
  *    consistency; writes since the last compaction are invisible.
  *  - [[ReadLevel.IndexAndBoundedWal]]: index + the FIRST `maxEntries`
  *    WAL entries since compaction — a consistent prefix with bounded
  *    query latency. Ops in later entries are invisible even on ids the
  *    prefix touches (the prefix is consistent, not per-id). The
  *    reference's bound is server-configured; here it rides the level
  *    value, the engine-config surface of a single-library build.
  */
sealed trait ReadLevel
object ReadLevel {
  case object IndexAndWal extends ReadLevel
  case object IndexOnly extends ReadLevel
  final case class IndexAndBoundedWal(maxEntries: Int) extends ReadLevel

  /** WAL-entry bound for a WIRE-requested bounded read — the
    * reference's bound is SERVER-configured (`plan.rs:561-564` "up to a
    * server-configured number of write-ahead log entries"), so the wire
    * form carries no number; this is that server knob.
    */
  val DefaultWalBound = 1024

  /** The Search envelope's `read_level` field (`plan.rs:588-592`,
    * serde snake_case).
    */
  def fromWire(s: String, bound: Int = DefaultWalBound): ReadLevel =
    s match {
      case "index_and_wal" => IndexAndWal
      case "index_only" => IndexOnly
      case "index_and_bounded_wal" => IndexAndBoundedWal(bound)
      case other => throw new IllegalArgumentException(
        s"unknown read_level '$other' — expected index_and_wal | " +
          "index_only | index_and_bounded_wal")
    }
}
