package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Concurrent-serving smoke THROUGH THE WIRE: the published quota admits
  * 10 concurrent reads per collection (`quotas-limits.mdx:33`; enforced
  * by `Quotas.Gates.withRead` inside the gated client reads), and
  * QuotasSpec/HttpFaceWireSpec prove admission mechanics — this main
  * MEASURES the serving behavior that quota implies over the face the
  * reference actually serves from: 10 client threads drive HTTP
  * `/query` batches against ONE served collection (declared SPANN
  * config, compacted segment, persisted IVF) fronted by
  * [[graft.api.HttpFace]], recording per-batch latency p50/p95. The
  * admission contract under test: at EXACTLY the cap, zero rejections
  * across every sequential batch — a permit LEAK anywhere in the gated
  * read paths would exhaust the semaphore and reject later batches; the
  * reentrancy seam would double-count and reject immediately. A second
  * over-cap stress phase (2× threads, simultaneous) records how many
  * requests the gate turns away — rejections there are expected and
  * must be clean 422s (the reference's quota error), never a hang, a
  * 500, or a connection error.
  *
  * The p95 ratchet normalizes by host calibration like Bench's: the
  * committed best carries the `host_cal_sec` of the run that set it,
  * and the flag fires on `(p95/ref)*(ref_cal/host_cal) > 1.3` — raw
  * ratios conflate code with box speed.
  *
  * Run: `sbt "runMain graft.ServeSmoke"` → one JSON line +
  * SERVE_SMOKE.json. Indexes persist under the bench index root and
  * build untimed, the same contract as Bench.
  */
object ServeSmoke {

  val Threads = 10
  val BatchesPerThread = 5
  val QueriesPerBatch = 8
  val K = 10

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // isolate the concurrency quota: everything else unlimited so record
    // shape caps never interfere with the corpus load
    val limits = graft.api.Quotas.Unlimited.copy(maxConcurrentReads = Threads)
    val root = graft.sources.CollectionStore.indexRoot(sfDir) + "/serve_smoke"
    val client = new graft.api.Client(spark, root, limits = limits)
    val coll = client.getOrCreateCollection("emb",
      graft.sources.Catalog.Schema(vectorIndex = Some(
        graft.sources.Catalog.SpannIndexConfig(space = "cosine",
          searchNprobe = 8, nReplica = 2))))
    if (coll.count() == 0L) {
      coll.add(Tables.embeddings(spark, sfDir).select(
        concat(lit("v"), col("vec_id")).as("id"),
        lit("e").as("document"), col("embedding")))
      coll.persist()
    }

    // the measured surface: the HTTP face over the same catalog root,
    // 2x-overload-wide pool so the admission gate (not the socket
    // accept queue) is what turns requests away
    val face = new graft.api.HttpFace(spark, root, limits,
      poolSize = Threads * 2 + 4)
    val port = face.start()
    val url = java.net.URI.create(
      s"http://127.0.0.1:$port/api/v2/tenants/default_tenant/databases/" +
        s"default_database/collections/emb/query")
    val http = java.net.http.HttpClient.newHttpClient()

    // per-thread query batches, driver-built (the wire contract): each
    // thread perturbs its own slice of stored vectors
    val baseVecs = Tables.embeddings(spark, sfDir)
      .orderBy(col("vec_id")).limit(Threads * QueriesPerBatch)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def batchJson(t: Int, b: Int): String = {
      val qs = (0 until QueriesPerBatch).map { i =>
        val (_, e) = baseVecs((t * QueriesPerBatch + i) % baseVecs.length)
        e.map(x => x + 1e-4f * ((t + b + i) % 7 - 3))
          .mkString("[", ",", "]")
      }.mkString("[", ",", "]")
      // distances-only include: the smoke measures the serving path
      // (route + probe + merge), not content hydration
      s"""{"query_embeddings":$qs,"n_results":$K,"include":["distances"]}"""
    }
    def post(body: String): Int = {
      val r = java.net.http.HttpRequest.newBuilder(url)
        .method("POST",
          java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      http.send(r, java.net.http.HttpResponse.BodyHandlers.ofString())
        .statusCode()
    }

    // warm untimed: lazy IVF build + file listings + codegen, through
    // the wire so the face's own path is warm too
    require(post(batchJson(0, 0)) == 200, "warmup query failed over HTTP")
    // host-speed calibration (Bench's fixed CPU job) — the p95 ratchet
    // keeps the best-ever window's value; a flag must be readable
    // against the box this round ran on
    val hostCal = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1L << 31).selectExpr("sum(xxhash64(id) % 1000000)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min

    def phase(nThreads: Int): (Seq[Double], Int, Int, Double) = {
      val rejected = new java.util.concurrent.atomic.AtomicInteger(0)
      val errors = new java.util.concurrent.atomic.AtomicInteger(0)
      val latencies = java.util.Collections.synchronizedList(
        new java.util.ArrayList[Double]())
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      val start = new java.util.concurrent.CountDownLatch(1)
      val done = new java.util.concurrent.CountDownLatch(nThreads)
      for (t <- 0 until nThreads) pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try {
            for (b <- 0 until BatchesPerThread) {
              val body = batchJson(t, b)
              val t0 = System.nanoTime()
              try post(body) match {
                case 200 => latencies.add((System.nanoTime() - t0) / 1e9)
                case 422 => rejected.incrementAndGet()
                case _ => errors.incrementAndGet()
              } catch { case _: Throwable => errors.incrementAndGet() }
            }
          } finally done.countDown()
        }
      })
      val wall0 = System.nanoTime()
      start.countDown()
      done.await()
      val wall = (System.nanoTime() - wall0) / 1e9
      pool.shutdown()
      import scala.jdk.CollectionConverters._
      (latencies.asScala.toSeq.sorted, rejected.get, errors.get, wall)
    }

    // phase 1 — AT the cap: the published 10 concurrent reads must all
    // admit, every batch, start to finish
    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) -1.0 else xs((p * (xs.size - 1)).round.toInt)
    var (ls, rejectedAtCap, errAtCap, wall) = phase(Threads)
    // downward-only p95 ratchet with the bench's restamp protocol, flags
    // on CALIBRATION-NORMALIZED ratios (r12 ask #1): past the normalized
    // band, re-run the at-cap phase once after a calm gap — both values
    // land in the artifact as a restamp pair (suite-vs-isolated
    // separates host stall from real regression), the kept stats are the
    // faster pass's, and the flag fires only if the KEPT p95 still
    // exceeds the normalized band
    val refPath = java.nio.file.Paths.get("serve_ref.json")
    val refTxt =
      if (java.nio.file.Files.exists(refPath))
        new String(java.nio.file.Files.readAllBytes(refPath), "UTF-8")
      else ""
    def field(k: String): Option[Double] =
      (s""""$k":([0-9.]+)""").r.findFirstMatchIn(refTxt).map(_.group(1).toDouble)
    val refP95: Option[Double] = field("p95_sec")
    // pre-sidecar refs (and the pre-HTTP direct-path ref) carry no cal:
    // seed with the fast-window class the committed bests came from
    val refCal: Double = field("cal").getOrElse(0.40)
    def norm(p: Double): Double =
      refP95.map(r => (p / r) * (refCal / hostCal)).getOrElse(1.0)
    var restamp: Option[(Double, Double)] = None
    if (refP95.isDefined && norm(pct(ls, 0.95)) > 1.3) {
      Thread.sleep(2000)
      val (ls1, rej1, err1, wall1) = phase(Threads)
      restamp = Some((pct(ls, 0.95), pct(ls1, 0.95)))
      // admission violations from EITHER pass count; latency keeps the min
      rejectedAtCap += rej1; errAtCap += err1
      if (pct(ls1, 0.95) < pct(ls, 0.95)) { ls = ls1; wall = wall1 }
    }
    val p95 = pct(ls, 0.95)
    val ratchetFlag = refP95.isDefined && norm(p95) > 1.3
    val newRef = math.min(refP95.getOrElse(Double.MaxValue), p95)
    // stamp this box's calibration when this run set the ratchet
    val newCal = if (p95 < refP95.getOrElse(Double.MaxValue)) hostCal else refCal
    java.nio.file.Files.write(refPath,
      f"""{"p95_sec":$newRef%.3f,"cal":$newCal%.3f,"http":true}%n"""
        .getBytes("UTF-8"))
    // phase 2 — OVER the cap (2x threads): the gate may turn requests
    // away; every turn-away must be a clean 422
    val (ls2, rejectedOver, errOver, _) = phase(Threads * 2)
    // ADMISSION CONTRACT, all live checks: zero rejections at cap (a
    // permit leak in any gated read would reject later batches; the
    // reentrancy seam failing would reject instantly); the 2x-overload
    // phase MUST turn some requests away (20 simultaneous latched
    // threads against a cap of 10 — a gate that admits everything is
    // exactly the regression this smoke exists to catch); zero
    // non-quota errors anywhere
    val violation = rejectedAtCap > 0 || errAtCap > 0 || errOver > 0 ||
      rejectedOver == 0
    val line =
      f"""{"metric":"serve_smoke","sf":"$sfDir","http":true,""" +
      f""""host_cal_sec":$hostCal%.3f,""" +
      f""""threads":$Threads,""" +
      f""""batches_per_thread":$BatchesPerThread,""" +
      f""""queries_per_batch":$QueriesPerBatch,"k":$K,""" +
      f""""p50_sec":${pct(ls, 0.5)}%.3f,"p95_sec":${pct(ls, 0.95)}%.3f,""" +
      f""""max_sec":${pct(ls, 1.0)}%.3f,"wall_sec":$wall%.3f,""" +
      f""""rejected_at_cap":$rejectedAtCap,""" +
      f""""overload_threads":${Threads * 2},""" +
      f""""overload_rejected":$rejectedOver,""" +
      f""""overload_p50_sec":${pct(ls2, 0.5)}%.3f,""" +
      f""""p95_ratchet":$newRef%.3f,"p95_ratchet_cal":$newCal%.3f,""" +
      f""""p95_norm_ratio":${norm(p95)}%.2f,""" +
      restamp.map { case (a, b) =>
        f""""p95_restamp":[$a%.3f,$b%.3f],""" }.getOrElse("") +
      f""""p95_ratchet_flag":$ratchetFlag,""" +
      f""""admission_violation":$violation}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("SERVE_SMOKE.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    face.stop()
    if (violation) sys.exit(1)
    spark.stop()
  }
}
