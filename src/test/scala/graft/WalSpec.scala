package graft

import graft.api.Client
import graft.sources.WalStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Durable multi-writer WAL (`sources/WalStore.scala`) — the wal3
  * contract (`rust/wal3/README.md:1-17`): appends commit durably at a
  * claimed log position, concurrent writers serialize into entry order,
  * opens replay exactly the entries the segment does not cover, crashed
  * appends void instead of blocking, and consumed entries GC.
  */
class WalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_wal").toString

  private def docs(coll: graft.api.CollectionHandle): Map[String, String] =
    coll.get(include = Seq("document")).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("document")).toMap

  test("commitLog survives the process; uncommitted in-memory ops do not") {
    val root = freshRoot()
    val c1 = new Client(spark, root)
    val h1 = c1.createCollection("w")
    h1.add(Seq(("a", "one"), ("b", "two")).toDF("id", "document"))
    h1.commitLog()
    h1.add(Seq(("c", "lost")).toDF("id", "document"))
    assert(h1.count() == 3) // read-your-writes sees both

    // "crash": a brand-new client + handle over the same root
    val h2 = new Client(spark, root).getCollection("w")
    assert(docs(h2) == Map("a" -> "one", "b" -> "two"))
  }

  test("two writers linearize by COMMIT order, not open order") {
    val root = freshRoot()
    val c = new Client(spark, root)
    val h1 = c.createCollection("race")
    val h2 = new Client(spark, root).getCollection("race")
    // both buffer a write to the same id; h1 commits first, h2 second
    h1.add(Seq(("x", "from-h1"), ("h1", "own")).toDF("id", "document"))
    h2.add(Seq(("x", "from-h2"), ("h2", "own")).toDF("id", "document"))
    val p1 = h1.commitLog()
    val p2 = h2.commitLog() // folds h1's entry, claims the next slot
    assert(p1 == 1L && p2 == 2L)
    // h2's Add of a live id is IGNORED under WAL semantics — but its own
    // id lands; LWW on x belongs to the FIRST committed Add
    val fresh = new Client(spark, root).getCollection("race")
    assert(docs(fresh) == Map("x" -> "from-h1", "h1" -> "own", "h2" -> "own"))

    // upsert replaces: the later COMMIT wins regardless of append order
    val u1 = new Client(spark, root).getCollection("race")
    val u2 = new Client(spark, root).getCollection("race")
    u2.upsert(Seq(("x", "u2-edit")).toDF("id", "document"))
    u1.upsert(Seq(("x", "u1-edit")).toDF("id", "document"))
    u2.commitLog(); u1.commitLog()
    val last = new Client(spark, root).getCollection("race")
    assert(docs(last)("x") == "u1-edit")
  }

  test("a lost position claim is loud for the loser and loses nothing") {
    val root = freshRoot() + "/coll"
    val one = Seq(graft.operators.Materialize.LogOp(
      "a", WalStore.OffsetStride, "Add", Some("d"), Map())).toDS()
    assert(WalStore.appendAt(root, 1L, one))
    assert(!WalStore.appendAt(root, 1L, one)) // slot taken
    assert(WalStore.publishedAfter(root, 0L) == Seq(1L))
    assert(WalStore.entryMeta(root, 1L).map(_._1).contains(1L))
  }

  test("a crashed append blocks consumption until voided, then unblocks") {
    val root = freshRoot()
    val c = new Client(spark, root)
    val h = c.createCollection("crash")
    h.add(Seq(("a", "one")).toDF("id", "document"))
    h.commitLog() // entry 1
    // simulate a claimant that died mid-append at position 2
    val markers = java.nio.file.Paths.get(h.ref.dataRoot, "_wal", "_entries")
    java.nio.file.Files.createFile(markers.resolve("b2.claim"))
    assert(WalStore.publishedAfter(h.ref.dataRoot, 0L) == Seq(1L))
    h.add(Seq(("b", "two")).toDF("id", "document"))
    intercept[java.util.concurrent.TimeoutException] {
      h.commitLog(timeoutMs = 300L)
    }
    // GC cadence voids the dead slot; the blocked append then lands past it
    assert(WalStore.recoverStaleClaims(h.ref.dataRoot, 0L) == Seq(2L))
    assert(h.commitLog() == 3L)
    val fresh = new Client(spark, root).getCollection("crash")
    assert(docs(fresh) == Map("a" -> "one", "b" -> "two"))
    assert(WalStore.entryMeta(h.ref.dataRoot, 2L).map(_._1).contains(0L))
  }

  test("persist records the walmark; opens do not double-replay; GC drops consumed entries") {
    val root = freshRoot()
    val c = new Client(spark, root)
    val h = c.createCollection("mark")
    h.add(Seq(("a", "one"), ("b", "two")).toDF("id", "document"))
    h.commitLog() // entry 1
    h.delete(Seq("b"))
    h.commitLog() // entry 2
    h.add(Seq(("c", "three")).toDF("id", "document")) // never logged
    h.persist() // segment covers everything seen; walmark = 2

    val dataRoot = h.ref.dataRoot
    assert(WalStore.readMark(
      graft.sources.CollectionStore.recordsRoot(dataRoot)) == 2L)
    val fresh = new Client(spark, root).getCollection("mark")
    assert(docs(fresh) == Map("a" -> "one", "c" -> "three"))
    // an entry committed AFTER the compaction replays over the segment
    fresh.upsert(Seq(("a", "edited")).toDF("id", "document"))
    fresh.commitLog() // entry 3
    val again = new Client(spark, root).getCollection("mark")
    assert(docs(again) == Map("a" -> "edited", "c" -> "three"))

    // GC floor is the OLDEST retained version's mark: with only v1 kept
    // (mark 2), entries 1-2 drop and entry 3 stays replayable
    again.gcVersions(keepLast = 2, staleClaimAgeMs = 0L)
    assert(WalStore.entryMeta(dataRoot, 1L).isEmpty)
    assert(WalStore.entryMeta(dataRoot, 2L).isEmpty)
    assert(WalStore.entryMeta(dataRoot, 3L).nonEmpty)
    val last = new Client(spark, root).getCollection("mark")
    assert(docs(last) == Map("a" -> "edited", "c" -> "three"))
  }

  test("offsets rebase into the entry's position range, preserving order") {
    val root = freshRoot()
    val c = new Client(spark, root)
    val h = c.createCollection("off")
    h.add(Seq(("a", "1")).toDF("id", "document"))
    h.delete(Seq("a"))
    h.add(Seq(("a", "2")).toDF("id", "document")) // add-after-delete
    h.commitLog()
    val entry = WalStore.readEntry(spark, h.ref.dataRoot, 1L).collect()
      .sortBy(_.log_offset)
    assert(entry.map(_.op).toSeq == Seq("Add", "Delete", "Add"))
    assert(entry.forall(o => o.log_offset >= WalStore.OffsetStride &&
      o.log_offset < 2 * WalStore.OffsetStride))
    val fresh = new Client(spark, root).getCollection("off")
    assert(docs(fresh) == Map("a" -> "2"))
  }

  test("offset order converges between a flushed live handle and a cold reopen") {
    val root = freshRoot()
    val c = new Client(spark, root)
    val h1 = c.createCollection("ord")
    h1.add(Seq(("x", "docx")).toDF("id", "document"))
    assert(h1.count() == 1) // the read flushes x into the segment at its
    // PRE-rebase offset — the committed entry must supersede that copy
    val h2 = new Client(spark, root).getCollection("ord")
    h2.add(Seq(("y", "docy")).toDF("id", "document"))
    h2.commitLog() // entry 1: y commits FIRST
    h1.commitLog() // entry 2: x rebases AFTER y
    def order(h: graft.api.CollectionHandle): Seq[String] =
      h.get(limit = Some(10)).collect().map(_.getAs[String]("id")).toSeq
    val cold = order(new Client(spark, root).getCollection("ord"))
    assert(cold == Seq("y", "x"), s"cold order $cold")
    // pre-fix the live handle kept x at its pre-rebase offset and paged
    // it BEFORE y — commit order must win on both views
    assert(order(h1) == cold, s"live ${order(h1)} != cold $cold")
  }

  test("a voided slot never replays leftover data; late publish loses the CAS") {
    val root = freshRoot()
    val c = new Client(spark, root)
    val h = c.createCollection("void")
    h.add(Seq(("a", "one")).toDF("id", "document"))
    h.commitLog() // entry 1
    // A claimant wrote its data at position 2 but crashed after the GC
    // cadence voided the slot: leftover parquet under a count-0 marker.
    val ops = Seq(graft.operators.Materialize.LogOp(
      "zombie", 2 * WalStore.OffsetStride, "Add", Some("never-acked"),
      Map.empty, None)).toDS()
    ops.write.parquet(WalStore.entryDataDir(h.ref.dataRoot, 2L))
    val markers = java.nio.file.Paths.get(h.ref.dataRoot, "_wal", "_entries")
    java.nio.file.Files.write(markers.resolve("b2"),
      """{"count": 0, "max_offset": -1}""".getBytes("UTF-8"))
    // the marker is the source of truth: the zombie ops must not replay
    assert(WalStore.readEntry(spark, h.ref.dataRoot, 2L).isEmpty)
    val fresh = new Client(spark, root).getCollection("void")
    assert(docs(fresh) == Map("a" -> "one"))
    // and a late appendAt on the voided slot loses the claim CAS loudly
    assert(!WalStore.appendAt(h.ref.dataRoot, 2L, ops))
  }

  test("full WAL protocol runs against a swapped ConditionalStore (in-memory)") {
    // pins that NO claim/publish/void/GC logic reaches around the
    // ConditionalStore interface: markers live purely in memory here,
    // so any direct filesystem access to _entries would break this
    val mem = new graft.sources.InMemoryConditionalStore
    val prev = WalStore.conditional
    WalStore.conditional = mem
    try {
      val root = freshRoot() + "/coll"
      def op(id: String, n: Long) = Seq(graft.operators.Materialize.LogOp(
        id, n * WalStore.OffsetStride, "Add", Some(s"doc-$id"), Map())).toDS()
      assert(WalStore.appendAt(root, 1L, op("a", 1)))
      assert(!WalStore.appendAt(root, 1L, op("b", 1))) // CAS in memory
      assert(WalStore.appendAt(root, 2L, op("b", 2)))
      assert(WalStore.publishedAfter(root, 0L) == Seq(1L, 2L))
      assert(WalStore.entryMeta(root, 1L).map(_._1).contains(1L))
      // no marker files on disk — everything went through the interface
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, "_wal", "_entries")))
      // crashed claim at 3 gaps the prefix until the void CAS fires
      assert(mem.putIfAbsent(s"$root/_wal/_entries/b3.claim",
        Array.emptyByteArray))
      assert(WalStore.appendAt(root, 3L, op("c", 3)) == false)
      mem.backdate(s"$root/_wal/_entries/b3.claim", 60000L)
      assert(WalStore.recoverStaleClaims(root, minAgeMs = 1000L) == Seq(3L))
      assert(WalStore.entryMeta(root, 3L).map(_._1).contains(0L)) // voided
      assert(WalStore.appendAt(root, 4L, op("c", 4)))
      // ops replay correctly through the streamed/metered reads
      assert(WalStore.readEntry(spark, root, 1L).collect().head.id == "a")
      assert(WalStore.readEntry(spark, root, 3L).isEmpty)
      // GC drops consumed markers through the interface too
      assert(WalStore.gcThrough(root, 2L) == Seq(1L, 2L))
      assert(WalStore.publishedAfter(root, 2L) == Seq(3L, 4L))
    } finally WalStore.conditional = prev
  }

  test("a publish APPLIED but mis-reported as lost does not duplicate the batch") {
    // the lost-response ambiguity a retrying HTTP backend cannot avoid:
    // the conditional put lands server-side, the response drops, the
    // retry sees the object and reports a loss. For the PUBLISH marker
    // appendAt must recognize the surviving marker as its own (byte
    // compare under claim ownership) and report the append WON — else
    // the writer re-appends the same ops at the next slot and readers
    // replay the batch twice.
    val inner = new graft.sources.InMemoryConditionalStore
    val liar = new graft.sources.ConditionalStore {
      // applies the write, then lies ONCE about a chosen marker path
      @volatile var lieAbout: String = ""
      def putIfAbsent(path: String, bytes: Array[Byte]): Boolean = {
        val won = inner.putIfAbsent(path, bytes)
        if (won && path == lieAbout) { lieAbout = ""; false } else won
      }
      def exists(p: String): Boolean = inner.exists(p)
      def read(p: String): Option[Array[Byte]] = inner.read(p)
      def delete(p: String): Unit = inner.delete(p)
      def list(p: String): Seq[String] = inner.list(p)
      def lastModifiedMs(p: String): Option[Long] = inner.lastModifiedMs(p)
    }
    val prev = WalStore.conditional
    WalStore.conditional = liar
    try {
      val root = freshRoot() + "/coll"
      def op(id: String, n: Long) = Seq(graft.operators.Materialize.LogOp(
        id, n * WalStore.OffsetStride, "Add", Some(s"doc-$id"), Map())).toDS()
      liar.lieAbout = s"$root/_wal/_entries/b1"
      assert(WalStore.appendAt(root, 1L, op("a", 1)),
        "an applied publish mis-reported as lost must still count as a win")
      assert(liar.lieAbout.isEmpty, "the lie was never exercised")
      assert(WalStore.publishedAfter(root, 0L) == Seq(1L))
      assert(WalStore.entryMeta(root, 1L).map(_._1).contains(1L))
      assert(!liar.exists(s"$root/_wal/_entries/b1.claim"),
        "the claim must be released after the recognized publish")
      // the slot is NOT re-appendable (no duplicate batch possible)
      assert(!WalStore.appendAt(root, 1L, op("dup", 1)))
      assert(WalStore.readEntry(spark, root, 1L).collect().map(_.id).toSeq
        == Seq("a"))
    } finally WalStore.conditional = prev
  }

  test("full WAL protocol runs over the HTTP object-store boundary") {
    // the wal3 mapping end-to-end across a REAL HTTP boundary: markers
    // CAS through S3-semantics conditional PUTs against an in-process
    // object-store fake; entry parquet stays on the data plane (the
    // Hadoop connectors' job, by design)
    val fake = new ObjectStoreHttpFake
    val http = new graft.sources.HttpConditionalStore(fake.endpoint)
    val prev = WalStore.conditional
    WalStore.conditional = http
    try {
      val root = freshRoot() + "/coll"
      def op(id: String, n: Long) = Seq(graft.operators.Materialize.LogOp(
        id, n * WalStore.OffsetStride, "Add", Some(s"doc-$id"), Map())).toDS()
      assert(WalStore.appendAt(root, 1L, op("a", 1)))
      assert(!WalStore.appendAt(root, 1L, op("b", 1))) // CAS over HTTP
      assert(WalStore.appendAt(root, 2L, op("b", 2)))
      assert(WalStore.publishedAfter(root, 0L) == Seq(1L, 2L))
      // no marker files on disk — they live behind the HTTP endpoint
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, "_wal", "_entries")))
      // crashed claim at 3 gaps the prefix until the void CAS fires
      assert(http.putIfAbsent(s"$root/_wal/_entries/b3.claim",
        Array.emptyByteArray))
      assert(!WalStore.appendAt(root, 3L, op("c", 3)))
      fake.backdate(s"$root/_wal/_entries/b3.claim", 60000L)
      assert(WalStore.recoverStaleClaims(root, minAgeMs = 1000L) == Seq(3L))
      assert(WalStore.appendAt(root, 4L, op("c", 4)))
      assert(WalStore.readEntry(spark, root, 1L).collect().head.id == "a")
      assert(WalStore.gcThrough(root, 2L) == Seq(1L, 2L))
      assert(WalStore.publishedAfter(root, 2L) == Seq(3L, 4L))
    } finally {
      WalStore.conditional = prev
      fake.stop()
    }
  }
}
