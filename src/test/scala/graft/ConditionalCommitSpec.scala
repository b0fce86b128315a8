package graft

import graft.api.{Client, CommitConflict}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Conditional commit — the reference's optimistic id-scoped
  * transactions (`service_based_frontend.rs:1859-1990`
  * `conditional_commit_append`; window validation
  * `rust/log-service/src/lib.rs:144-260`): buffered writes commit to the
  * durable log iff no entry after the observed offset touches a read or
  * write id. The engine's claim-first CAS append gives the same
  * atomicity as the reference's enqueue-time admission predicate —
  * winning the claim proves the validated window is complete.
  *
  * The concurrency test is the textbook serializability probe: N
  * threads doing read-modify-write increments through transactions with
  * retry-on-conflict must lose NO update.
  */
class ConditionalCommitSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_tx").toString

  private def df(rows: (String, String)*): DataFrame =
    rows.toDF("id", "document")

  test("commit applies buffered writes atomically and survives reopen") {
    val root = freshRoot()
    val client = new Client(spark, root)
    val coll = client.createCollection("t1")
    coll.add(df("a" -> "alpha", "b" -> "beta"))
    coll.commitLog()

    val tx = coll.beginTransaction()
    tx.update(df("a" -> "alpha v2"))
    tx.add(df("c" -> "gamma"))
    tx.delete(Seq("b"))
    val res = tx.commit()
    assert(res.isRight, s"clean tx must commit: $res")

    def state(h: graft.api.CollectionHandle): Map[String, String] =
      h.get(include = Seq("document")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val expect = Map("a" -> "alpha v2", "c" -> "gamma")
    assert(state(coll) == expect)
    // durable: a fresh open replays the committed entry
    assert(state(new Client(spark, root).getCollection("t1")) == expect)
    // one-shot: the transaction cannot be reused
    intercept[IllegalArgumentException] { tx.add(df("d" -> "x")) }
    intercept[IllegalArgumentException] { tx.commit() }
  }

  test("read-write conflict rejects; nothing is applied") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("t2")
    coll.add(df("a" -> "alpha", "b" -> "beta"))
    coll.commitLog()

    val tx = coll.beginTransaction()
    val read = tx.get(Seq("a")).collect()
    assert(read.map(_.getString(1)).toSeq == Seq("alpha"))
    tx.update(df("b" -> "beta from tx")) // writes only b; reads a

    // interloper touches the READ id and commits first
    val h2 = client.getCollection("t2")
    h2.upsert(df("a" -> "alpha stomped"))
    h2.commitLog()

    tx.commit() match {
      case Left(CommitConflict(_, ids)) => assert(ids == Seq("a"))
      case Right(p) => fail(s"tx must reject on read-id conflict, got $p")
    }
    // the buffered write on b must NOT have applied
    val doc = coll.get(include = Seq("document")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(doc == Map("a" -> "alpha stomped", "b" -> "beta"))
  }

  test("write-write conflict rejects; disjoint ids commit clean") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("t3")
    coll.add(df("a" -> "alpha", "b" -> "beta"))
    coll.commitLog()

    val txA = coll.beginTransaction()
    txA.update(df("a" -> "alpha txA")) // no reads — write-write only
    val txB = coll.beginTransaction()
    txB.update(df("b" -> "beta txB")) // disjoint from the interloper

    val h2 = client.getCollection("t3")
    h2.update(df("a" -> "alpha stomped"))
    h2.commitLog()

    assert(txA.commit().isLeft, "write-write overlap must reject")
    assert(txB.commit().isRight, "disjoint ids must commit")
    val doc = coll.get(include = Seq("document")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(doc == Map("a" -> "alpha stomped", "b" -> "beta txB"))
  }

  test("read-only fence: validates reads, publishes a skippable entry") {
    val root = freshRoot()
    val client = new Client(spark, root)
    val coll = client.createCollection("t4")
    coll.add(df("a" -> "alpha"))
    coll.commitLog() // entry 1

    // clean fence: no entry after observed touches 'a'
    val fence = coll.beginTransaction().trackReads(Seq("a")).commit()
    assert(fence == Right(2L), s"fence must claim the next slot: $fence")

    // the fence is a count-0 entry every reader skips
    assert(coll.count() == 1L)
    val reopened = new Client(spark, root).getCollection("t4")
    assert(reopened.count() == 1L)

    // a stale read horizon rejects once the id is touched
    val h2 = client.getCollection("t4")
    h2.update(df("a" -> "alpha v2"))
    h2.commitLog() // entry 3
    val stale = coll.beginTransaction(observedLogOffset = Some(2L))
      .trackReads(Seq("a")).commit()
    assert(stale.isLeft, s"fence over a touched read id must reject: $stale")
  }

  test("bounds and argument validation is loud") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("t5")
    coll.add(df("a" -> "alpha"))
    coll.commitLog()
    // beyond the tail
    intercept[IllegalArgumentException] {
      coll.beginTransaction(observedLogOffset = Some(99L))
        .trackReads(Seq("a")).commit()
    }
    // empty ids rejected like the reference's normalize_conditional_ids
    intercept[IllegalArgumentException] {
      coll.beginTransaction().trackReads(Seq(""))
    }
    // negative observed offset
    intercept[IllegalArgumentException] {
      coll.beginTransaction(observedLogOffset = Some(-1L))
    }
  }

  test("GC'd validation window fails loudly, never validates blind") {
    val root = freshRoot()
    val client = new Client(spark, root)
    val coll = client.createCollection("t6")
    coll.add(df("a" -> "alpha"))
    coll.commitLog() // entry 1
    val h2 = client.getCollection("t6")
    h2.update(df("a" -> "alpha v2"))
    h2.commitLog() // entry 2
    // drop entry 1 from the log (as a GC after compaction would)
    graft.sources.WalStore.gcThrough(coll.ref.dataRoot, 1L)
    val tx = coll.beginTransaction(observedLogOffset = Some(0L))
      .trackReads(Seq("a"))
    val e = intercept[IllegalArgumentException] { tx.commit() }
    assert(e.getMessage.contains("readable log lower bound"))
  }

  test("concurrent read-modify-write increments lose no update") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("ctr")
    coll.add(df("ctr" -> "0"))
    coll.commitLog()

    val threads = 5
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // forensics on the rare-loaded-host flake: every COMMITTED attempt's
    // (thread, read value, won log position) — a lost update shows two
    // positions that committed from the same read value
    val commits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        try {
          gate.await()
          val h = client.getCollection("ctr")
          var committed = false
          var tries = 0
          while (!committed && tries < 60) {
            tries += 1
            val tx = h.beginTransaction()
            val cur = tx.get(Seq("ctr")).collect()(0).getString(1).toInt
            tx.update(df("ctr" -> (cur + 1).toString))
            tx.commit(timeoutMs = 120000L) match {
              case Right(pos) =>
                commits.add(s"t$t read=$cur wrote=${cur + 1} pos=$pos")
                committed = true
              case Left(_) => ()
            }
          }
          if (!committed)
            throw new IllegalStateException("increment never committed")
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
    assert(failures.isEmpty, s"worker failures: ${failures}")

    // read through a FRESH handle: `coll` predates the increments and a
    // handle folds committed entries on its own write/commit paths, not
    // on get (read-your-writes, not read-everyone's-writes)
    val fin = client.getCollection("ctr")
      .get(include = Seq("document")).collect()
    assert(fin.length == 1)
    assert(fin(0).getString(1).toInt == threads,
      s"lost update: counter=${fin(0).getString(1)} after $threads " +
        s"increments; commits=${commits.toArray.mkString("[", ", ", "]")}")
  }
}
