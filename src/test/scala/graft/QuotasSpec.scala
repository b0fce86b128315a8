package graft

import graft.api.{Client, Quotas}
import graft.model.Where
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's published quota envelope
  * (`docs/mintlify/cloud/quotas-limits.mdx`) enforced at the client edge:
  * predicate count, regex bytes, result k, batch size, embedding width.
  * Unlimited collections must skip every check (and the data-plane jobs
  * the checks would cost).
  */
class QuotasSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def freshClient(limits: Quotas.Limits) = {
    val root = java.nio.file.Files.createTempDirectory("quotas").toString
    new Client(spark, root, limits = limits)
  }

  private def wide(n: Int): Where.Expr =
    Where.And((1 to n).map(i => Where.Cmp(s"k$i", "$eq", Where.VStr("v"))))

  test("predicate count: leaves are counted through nesting, connectives are not") {
    assert(Quotas.predicateCount(wide(8)) == 8)
    val nested = Where.Or(Seq(wide(4), Where.And(Seq(wide(3),
      Where.DocContains("x", negated = false)))))
    assert(Quotas.predicateCount(nested) == 8)
  }

  test("cloud limits reject over-envelope queries and writes") {
    val c = freshClient(Quotas.CloudDefaults)
    val col1 = c.createCollection("qcol")
    col1.add(Seq(("a", "doc a"), ("b", "doc b")).toDF("id", "document"))

    // 9 predicates > 8
    intercept[Quotas.QuotaExceeded] { col1.get(where = Some(wide(9))) }
    // regex needle over 256 bytes
    intercept[Quotas.QuotaExceeded] {
      col1.get(where = Some(Where.DocContains("x" * 257, negated = false)))
    }
    // k > 300
    intercept[Quotas.QuotaExceeded] {
      col1.query(Seq((0L, Seq(1f, 0f))).toDF("query_id", "q_embedding"), k = 301)
    }
    // batch of 301 > 300
    intercept[Quotas.QuotaExceeded] {
      col1.add(spark.range(301).select(
        col("id").cast("string").as("id"), lit("d").as("document")))
    }
    // 4097-dim embedding > 4096
    intercept[Quotas.QuotaExceeded] {
      col1.add(Seq(("z", "doc z", Seq.fill(4097)(0f)))
        .toDF("id", "document", "embedding"))
    }
    // in-envelope traffic still flows
    assert(col1.get(where = Some(wide(8))).count() == 0)
    assert(col1.count() == 2)
  }

  test("size ceiling is op-aware: update/upsert of live ids pass at the cap") {
    val tiny = Quotas.CloudDefaults.copy(maxRecordsPerCollection = 3L)
    val c = freshClient(tiny)
    val col1 = c.createCollection("cap")
    col1.add(Seq(("a", "da"), ("b", "db"), ("c", "dc")).toDF("id", "document"))
    // at the cap: updates and upserts of EXISTING ids must not be
    // rejected (they replace, not grow)
    col1.update(Seq(("a", "da2")).toDF("id", "document"))
    col1.upsert(Seq(("b", "db2"), ("c", "dc2")).toDF("id", "document"))
    assert(col1.count() == 3)
    // a genuinely new id past the cap still trips
    intercept[Quotas.QuotaExceeded] {
      col1.add(Seq(("d", "dd")).toDF("id", "document"))
    }
    // mixed upsert (1 live + 1 fresh) exceeds: 3 + 1 new > 3
    intercept[Quotas.QuotaExceeded] {
      col1.upsert(Seq(("a", "da3"), ("e", "de")).toDF("id", "document"))
    }
  }

  test("dim quota checks the batch MAX, not the first embedded row") {
    val c = freshClient(Quotas.CloudDefaults)
    val col1 = c.createCollection("dims")
    intercept[Quotas.QuotaExceeded] {
      col1.add(Seq(
        ("ok", "d1", Seq.fill(4)(0f)),          // first row within limits
        ("bad", "d2", Seq.fill(4097)(0f)))      // second row over
        .toDF("id", "document", "embedding"))
    }
  }

  test("importJsonl chunks a dump larger than maxBatchRecords") {
    val root = java.nio.file.Files.createTempDirectory("quotas").toString
    // the dump is produced unlimited; the IMPORT side runs under quota
    val src = new Client(spark, root).createCollection("dump_big_src")
    src.add(spark.range(650).select(
      format_string("id%04d", col("id")).as("id"), lit("doc").as("document")))
    val c = new Client(spark, root, limits = Quotas.CloudDefaults)
    val path = java.nio.file.Files.createTempDirectory("dump").toString + "/d"
    src.exportJsonl(path)
    val dst = c.createCollection("dump_big_dst")
    dst.importJsonl(path) // 650 > 300: must chunk, not throw
    assert(dst.count() == 650)
  }

  test("published quota table parity: CloudDefaults carries every quotas-limits.mdx row") {
    // quotas-limits.mdx:13-35, row by row, in table order — a drifted
    // constant fails here by name
    val L = Quotas.CloudDefaults
    val parity: Seq[(String, Long, Long)] = Seq(
      ("Maximum embedding dimensions", L.maxDim, 4096L),
      ("Maximum document bytes", L.maxDocumentBytes, 16384L),
      ("Maximum URI bytes", L.maxUriBytes, 256L),
      ("Maximum ID size bytes", L.maxIdBytes, 128L),
      ("Maximum database name size bytes", L.maxNameBytes, 128L),
      ("Maximum collection name size bytes", L.maxNameBytes, 128L),
      ("Maximum record metadata value size bytes",
        L.maxRecordMetaValueBytes, 8182L),
      ("Maximum collection metadata value size bytes",
        L.maxCollectionMetaValueBytes, 256L),
      ("Maximum metadata key size bytes", L.maxMetaKeyBytes, 36L),
      ("Maximum number of record metadata keys", L.maxRecordMetaKeys, 32L),
      ("Maximum number of collection metadata keys",
        L.maxCollectionMetaKeys, 32L),
      ("Maximum number of where predicates", L.maxWherePredicates, 8L),
      ("Maximum size of full text search or regex search",
        L.maxRegexBytes, 256L),
      ("Maximum number of results returned", L.maxResults, 300L),
      ("Maximum number of concurrent reads per collection",
        L.maxConcurrentReads, 10L),
      ("Maximum number of concurrent writes per collection",
        L.maxConcurrentWrites, 10L),
      ("Maximum number of collections", L.maxCollections, 1000000L),
      ("Maximum number of records per collection",
        L.maxRecordsPerCollection, 5000000L),
      ("Maximum fork edges from root", L.maxForkEdges, 256L),
      ("Maximum number of records per write", L.maxBatchRecords, 300L))
    parity.foreach { case (row, got, want) =>
      assert(got == want, s"'$row': Limits carries $got, published $want")
    }
  }

  test("table-driven rejection: each record-shape limit trips at limit+1, passes at limit") {
    val c = freshClient(Quotas.CloudDefaults)
    val col1 = c.createCollection("shapes")
    def rec(id: String = "ok1", doc: String = "d",
        meta: Map[String, String] = Map("k" -> "v")) =
      Seq((id, doc, meta)).toDF("id", "document", "meta")
    // (published row, over-limit batch, at-limit batch)
    val cases: Seq[(String, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame)] = Seq(
      ("ID size bytes", rec(id = "x" * 129), rec(id = "x" * 128)),
      ("document bytes", rec(doc = "x" * 16385), rec(doc = "x" * 16384)),
      ("metadata key size bytes",
        rec(meta = Map("k" * 37 -> "v")), rec(meta = Map("k" * 36 -> "v"))),
      ("record metadata value size bytes",
        rec(meta = Map("k" -> "v" * 8183)), rec(meta = Map("k" -> "v" * 8182))),
      ("record metadata keys",
        rec(meta = (1 to 33).map(i => s"k$i" -> "v").toMap),
        rec(meta = (1 to 32).map(i => s"k$i" -> "v").toMap)))
    cases.foreach { case (row, over, at) =>
      val e = intercept[Quotas.QuotaExceeded](col1.add(over))
      assert(e.getMessage.toLowerCase.contains(
        row.split(" ").head.toLowerCase), s"'$row': wrong error $e")
      col1.add(at) // the at-limit twin must flow
    }
    // URI bytes ride a dedicated column pre-encode
    intercept[Quotas.QuotaExceeded] {
      col1.add(Seq(("uok", "d", "u" * 257)).toDF("id", "document", "uri"))
    }
    col1.add(Seq(("uok", "d", "u" * 256)).toDF("id", "document", "uri"))
  }

  test("name rules: byte cap plus the reference's shape validation under quota") {
    val c = freshClient(Quotas.CloudDefaults)
    // over 128 bytes
    intercept[Quotas.QuotaExceeded] { c.createCollection("x" * 129) }
    // reference validate_name shapes: 3-char minimum, charset,
    // alphanumeric ends, no '..', not an IP
    intercept[Quotas.QuotaExceeded] { c.createCollection("ab") }
    intercept[Quotas.QuotaExceeded] { c.createCollection("_abc") }
    intercept[Quotas.QuotaExceeded] { c.createCollection("a..b") }
    intercept[Quotas.QuotaExceeded] { c.createCollection("10.2.3.4") }
    c.createCollection("A-valid.name_0") // in-envelope
    // the reference's topology form (validators.rs:44-71): ONE '+'
    // splits two independently-valid names
    c.createCollection("topo-a+db.name")
    intercept[Quotas.QuotaExceeded] { c.createCollection("a+b+c") }
    intercept[Quotas.QuotaExceeded] { c.createCollection("topo+a..b") }
    intercept[Quotas.QuotaExceeded] { c.createCollection("ab+okname") }
    // database name rides the same rule
    intercept[Quotas.QuotaExceeded] {
      new Client(spark,
        java.nio.file.Files.createTempDirectory("qdb").toString,
        database = "db has spaces", limits = Quotas.CloudDefaults)
    }
    // unlimited clients keep the relaxed catalog-structural check only
    freshClient(Quotas.Unlimited).createCollection("ab")
  }

  test("collection metadata limits: key count, key bytes, value bytes") {
    val c = freshClient(Quotas.CloudDefaults)
    intercept[Quotas.QuotaExceeded] {
      c.createCollection("md1", metadata = (1 to 33).map(i => s"k$i" -> "v").toMap)
    }
    intercept[Quotas.QuotaExceeded] {
      c.createCollection("md2", metadata = Map("k" -> "v" * 257))
    }
    intercept[Quotas.QuotaExceeded] {
      c.createCollection("md3", metadata = Map("k" * 37 -> "v"))
    }
    val ok = c.createCollection("md4",
      metadata = Map("k" * 36 -> "v" * 256)) // at-limit passes
    // modify re-validates
    intercept[Quotas.QuotaExceeded] {
      c.modifyCollection("md4", metadata = Some(Map("k" -> "v" * 257)))
    }
  }

  test("typed metadata columns count against the key quotas too") {
    // a record's metadata keys are ONE dictionary in the reference,
    // however they are typed — keys split across the string map and the
    // typed maps must not slip past the count or key-size caps
    val c = freshClient(Quotas.CloudDefaults)
    val col1 = c.createCollection("typedq")
    intercept[Quotas.QuotaExceeded] { // 20 str + 13 int keys = 33 > 32
      col1.add(Seq(("t1", "d",
        (1 to 20).map(i => s"s$i" -> "v").toMap,
        (1 to 13).map(i => s"i$i" -> i.toLong).toMap))
        .toDF("id", "document", "meta", "meta_int"))
    }
    intercept[Quotas.QuotaExceeded] { // 37-byte key inside meta_int
      col1.add(Seq(("t2", "d", Map("k" * 37 -> 1L)))
        .toDF("id", "document", "meta_int"))
    }
    // at-limit twin flows: 20 + 12 = 32 keys, 36-byte typed key
    col1.add(Seq(("t3", "d",
      (1 to 20).map(i => s"s$i" -> "v").toMap,
      (1 to 11).map(i => s"i$i" -> i.toLong).toMap + ("k" * 36 -> 1L)))
      .toDF("id", "document", "meta", "meta_int"))
  }

  test("collection count and fork edges from root") {
    val lim = Quotas.CloudDefaults.copy(maxCollections = 2L, maxForkEdges = 2)
    val c = freshClient(lim)
    val base1 = c.createCollection("col1")
    base1.add(Seq(("a", "d")).toDF("id", "document"))
    c.createCollection("col2")
    intercept[Quotas.QuotaExceeded] { c.createCollection("col3") }
    // a fork mints a catalog entry too — it must not bypass the cap
    intercept[Quotas.QuotaExceeded] { c.forkCollection("col1", "col3f") }

    val cf = freshClient(Quotas.CloudDefaults.copy(maxForkEdges = 2))
    val src = cf.createCollection("root0")
    src.add(Seq(("id1", "doc")).toDF("id", "document"))
    src.persist() // forks copy-on-write read this segment
    cf.forkCollection("root0", "fork1")
    cf.forkCollection("fork1", "fork2") // a fork OF a fork still hangs off root0
    // 2 edges from root0 — a third fork anywhere in the tree trips
    intercept[Quotas.QuotaExceeded] { cf.forkCollection("root0", "fork3") }
    intercept[Quotas.QuotaExceeded] { cf.forkCollection("fork2", "fork4") }

    // renaming a fork PARENT must not brick future forks or reset the
    // edge budget: the rename rewrites children's forkedFrom old→new,
    // so the tree stays intact under the new name
    cf.modifyCollection("root0", newName = Some("root0renamed"))
    assert(cf.getCollection("fork1").ref.forkedFrom
        .contains("root0renamed"),
      "rename must rewrite the child's forkedFrom")
    // the 2 existing edges still hang off the (renamed) root: another
    // fork anywhere in the tree still trips — and RESOLVES (no
    // 'no such collection root0' crash), both through the renamed root
    // and through a grandchild whose chain crosses the renamed node
    intercept[Quotas.QuotaExceeded] {
      cf.forkCollection("root0renamed", "fork5")
    }
    intercept[Quotas.QuotaExceeded] { cf.forkCollection("fork2", "fork6") }
    // a fork of the renamed tree still reads the shared segment through
    // the rewritten chain (copy-on-write resolution survives the rename)
    assert(cf.getCollection("fork2").count() == 1)
  }

  test("concurrent read/write admission rejects past the per-collection cap") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val lim = Quotas.CloudDefaults
    val key = java.util.UUID.randomUUID().toString
    val hold = new CountDownLatch(1)
    val inGate = new CountDownLatch(10)
    val pool = Executors.newFixedThreadPool(10)
    try {
      (1 to 10).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = Quotas.Gates.withRead(key, lim) {
            inGate.countDown(); hold.await()
          }
        })
      }
      assert(inGate.await(10, TimeUnit.SECONDS), "10 readers admitted")
      // the 11th concurrent read REJECTS (the reference errors, not queues)
      intercept[Quotas.QuotaExceeded] {
        Quotas.Gates.withRead(key, lim) { () }
      }
      // writes are tracked independently per collection
      Quotas.Gates.withWrite(key, lim) { () }
    } finally { hold.countDown(); pool.shutdown() }
    // permits release: after drain, reads flow again
    assert(pool.awaitTermination(10, TimeUnit.SECONDS))
    Quotas.Gates.withRead(key, lim) { () }
  }

  test("read gate is reentrant per thread: composed reads count once") {
    // one logical read that composes gated entry points (search → query,
    // queryText → query) must admit as ONE request — a nested acquire
    // under a cap-1 gate must not self-reject, and the permit must
    // survive the inner exit
    val lim = Quotas.CloudDefaults.copy(maxConcurrentReads = 1)
    val key = java.util.UUID.randomUUID().toString
    val out = Quotas.Gates.withRead(key, lim) {
      val inner = Quotas.Gates.withRead(key, lim) { 41 }
      // the inner exit must NOT have released this thread's permit: a
      // second thread is still rejected here
      val t = new java.util.concurrent.atomic.AtomicBoolean(false)
      val th = new Thread(() => {
        try Quotas.Gates.withRead(key, lim) { () }
        catch { case _: Quotas.QuotaExceeded => t.set(true) }
      })
      th.start(); th.join()
      assert(t.get, "outer permit vanished after the nested exit")
      inner + 1
    }
    assert(out == 42)
    // fully exited: the permit is back
    Quotas.Gates.withRead(key, lim) { () }
  }

  test("unlimited collections skip enforcement") {
    val c = freshClient(Quotas.Unlimited)
    val col1 = c.createCollection("u")
    col1.add(spark.range(301).select(
      col("id").cast("string").as("id"), lit("d").as("document")))
    assert(col1.get(where = Some(wide(9))).count() == 0)
    assert(col1.count() == 301)
  }
}
