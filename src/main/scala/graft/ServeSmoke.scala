package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Concurrent-serving smoke: the published quota admits 10 concurrent
  * reads per collection (`quotas-limits.mdx:33`; enforced by
  * `Quotas.Gates.withRead`), and QuotasSpec proves admission mechanics —
  * this main MEASURES the serving behavior that quota implies: 10
  * threads drive `queryAnn` batches against ONE served collection
  * (declared SPANN config, compacted segment, persisted IVF), recording
  * per-batch latency p50/p95 and asserting zero spurious admissions
  * rejections at exactly the cap (a violation = a thread inside the cap
  * rejected, or more than `maxConcurrentReads` observed in flight at
  * once, tracked with an in-flight high-water counter around each gated
  * call).
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
    val handle = client.getCollection("emb")

    // per-thread query batches, driver-built (the wire contract): each
    // thread perturbs its own slice of stored vectors
    val baseVecs = Tables.embeddings(spark, sfDir)
      .orderBy(col("vec_id")).limit(Threads * QueriesPerBatch)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    import spark.implicits._
    def batchOf(t: Int, b: Int) = {
      val rows = (0 until QueriesPerBatch).map { i =>
        val (_, e) = baseVecs((t * QueriesPerBatch + i) % baseVecs.length)
        (i.toLong, e.map(x => x + 1e-4f * ((t + b + i) % 7 - 3)))
      }
      rows.toDF("query_id", "q_embedding")
    }

    // warm untimed: lazy IVF build + file listings + codegen
    handle.queryAnn(batchOf(0, 0), K).count()

    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val highWater = new java.util.concurrent.atomic.AtomicInteger(0)
    val rejected = new java.util.concurrent.atomic.AtomicInteger(0)
    val latencies =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[Double]())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(Threads)
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(Threads)
    for (t <- 0 until Threads) pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try {
          for (b <- 0 until BatchesPerThread) {
            val q = batchOf(t, b)
            val t0 = System.nanoTime()
            try {
              val n = inFlight.incrementAndGet()
              highWater.getAndUpdate(h => math.max(h, n))
              try handle.queryAnn(q, K).count()
              finally inFlight.decrementAndGet()
            } catch {
              case _: graft.api.Quotas.QuotaExceeded =>
                rejected.incrementAndGet()
            }
            latencies.add((System.nanoTime() - t0) / 1e9)
          }
        } finally done.countDown()
      }
    })
    val wall0 = System.nanoTime()
    start.countDown()
    done.await()
    val wall = (System.nanoTime() - wall0) / 1e9
    pool.shutdown()

    val ls = {
      import scala.jdk.CollectionConverters._
      latencies.asScala.toSeq.sorted
    }
    def pct(p: Double): Double = ls((p * (ls.size - 1)).round.toInt)
    // ADMISSION CONTRACT: exactly-at-cap load sees zero rejections (the
    // cap is 10 and 10 threads never exceed it), and the observed
    // concurrency never exceeded the cap
    val violation = rejected.get > 0 || highWater.get > Threads
    val line =
      f"""{"metric":"serve_smoke","sf":"$sfDir","threads":$Threads,""" +
      f""""batches_per_thread":$BatchesPerThread,""" +
      f""""queries_per_batch":$QueriesPerBatch,"k":$K,""" +
      f""""p50_sec":${pct(0.5)}%.3f,"p95_sec":${pct(0.95)}%.3f,""" +
      f""""max_sec":${ls.last}%.3f,"wall_sec":$wall%.3f,""" +
      f""""rejected":${rejected.get},"max_in_flight":${highWater.get},""" +
      f""""admission_violation":$violation}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("SERVE_SMOKE.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    if (violation) sys.exit(1)
    spark.stop()
  }
}
