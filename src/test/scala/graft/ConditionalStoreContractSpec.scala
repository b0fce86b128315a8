package graft

import graft.sources.{ConditionalStore, InMemoryConditionalStore, LocalFsConditionalStore}
import org.scalatest.funsuite.AnyFunSuite

/** Contract every [[graft.sources.ConditionalStore]] implementation must
  * satisfy — the WAL's claim/publish/void protocol is correct against
  * ANY store passing this suite. The object-store mapping is documented
  * per operation on the trait (S3 `If-None-Match: *` conditional put /
  * HEAD / GET / DELETE / LIST / Last-Modified); an S3 implementation
  * drops in by passing these same cases.
  */
class ConditionalStoreContractSpec extends AnyFunSuite {

  private def contract(name: String, mk: () => (ConditionalStore, String)): Unit = {
    test(s"$name: putIfAbsent is create-once, read/exists/delete/list agree") {
      val (s, base) = mk()
      val p = s"$base/dir/b1"
      assert(!s.exists(p) && s.read(p).isEmpty && s.lastModifiedMs(p).isEmpty)
      assert(s.putIfAbsent(p, "v1".getBytes("UTF-8")), "first create must win")
      assert(!s.putIfAbsent(p, "v2".getBytes("UTF-8")),
        "second create must lose — this is the CAS the WAL hangs on")
      assert(s.exists(p))
      assert(new String(s.read(p).get, "UTF-8") == "v1",
        "a losing put must not clobber the winner's bytes")
      assert(s.lastModifiedMs(p).nonEmpty)
      s.delete(p)
      assert(!s.exists(p) && s.read(p).isEmpty)
      s.delete(p) // idempotent: deleting a missing key succeeds
      // list: immediate children only, empty prefix is empty not an error
      assert(s.list(s"$base/nope").isEmpty)
      s.putIfAbsent(s"$base/dir/b2", Array.emptyByteArray)
      s.putIfAbsent(s"$base/dir/b3.claim", Array.emptyByteArray)
      assert(s.list(s"$base/dir").toSet == Set("b2", "b3.claim"))
    }

    test(s"$name: exactly one of N racing putIfAbsent callers wins") {
      val (s, base) = mk()
      val p = s"$base/race/slot"
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val latch = new java.util.concurrent.CountDownLatch(1)
        val tasks = (0 until 16).map { i =>
          pool.submit(new Runnable {
            def run(): Unit = {
              latch.await()
              if (s.putIfAbsent(p, s"writer-$i".getBytes)) wins.incrementAndGet()
            }
          })
        }
        latch.countDown()
        tasks.foreach(_.get())
        assert(wins.get() == 1, s"${wins.get()} writers claimed one slot")
      } finally pool.shutdown()
    }
  }

  contract("local-fs", () =>
    (LocalFsConditionalStore,
      java.nio.file.Files.createTempDirectory("cs_contract").toString))
  contract("in-memory", () => (new InMemoryConditionalStore, "/mem"))

  // the S3-semantics impl over a REAL HTTP boundary: conditional PUT via
  // If-None-Match, HEAD/GET/DELETE, ListObjectsV2 — same cases, same CAS
  // race, exercised through an in-process object-store fake
  private lazy val fake = new ObjectStoreHttpFake
  contract("http-s3", () =>
    (new graft.sources.HttpConditionalStore(fake.endpoint),
      "cs-" + java.util.UUID.randomUUID().toString.take(8)))

  // a THROTTLING endpoint (503 on every 3rd request, before applying —
  // the S3 SlowDown shape): the client's bounded retries must make the
  // ENTIRE contract pass unchanged, including the 16-thread CAS race
  private lazy val flaky = new ObjectStoreHttpFake(failEveryN = 3)
  contract("http-s3-throttled", () =>
    (new graft.sources.HttpConditionalStore(flaky.endpoint),
      "cs-" + java.util.UUID.randomUUID().toString.take(8)))

  test("http-s3: list follows ListObjectsV2 pagination across server pages") {
    // S3 pages at max-keys (1000): a single-page client would silently
    // truncate a WAL with more markers than one page — the fake pages at
    // 3 here so the continuation-token loop is actually exercised
    val paged = new ObjectStoreHttpFake(pageSize = 3)
    try {
      val s = new graft.sources.HttpConditionalStore(paged.endpoint)
      val names = (0 until 10).map(i => f"b$i%02d.claim")
      names.foreach(n =>
        assert(s.putIfAbsent(s"pg/dir/$n", Array.emptyByteArray)))
      assert(s.list("pg/dir").sorted == names.sorted,
        "every page's entries must surface, in any order")
    } finally paged.stop()
  }
}
