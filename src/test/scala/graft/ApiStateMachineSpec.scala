package graft

import graft.api.{Client, CollectionHandle}
import graft.model.Where
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** API-level STATEFUL property machine — the reference's primary test
  * strategy (`chromadb/test/property/test_embeddings.py` Hypothesis
  * rule machine + `chromadb/test/property/invariants.py:109-438`):
  * seeded random interleavings of the USER API — add / upsert / update /
  * delete / deleteWhere / persist / REOPEN / FORK — against a
  * driver-side model, with the invariant battery after every step:
  *
  *   - `count` == model size (`invariants.py:109` count);
  *   - ids / documents / metadata / embeddings round-trip exactly
  *     (`invariants.py` ids_match / metadatas_match / documents_match);
  *   - after every persist, reopen, and fork — and at each sequence
  *     end — `ann_accuracy` ≥ 0.95 on the SERVED HNSW path (index +
  *     RYW tail legs), mirroring `invariants.py:281` with the same
  *     recall gate, plus the exact in-plan KNN as its own oracle.
  *
  * Ops follow the reference client's contract (update/delete target
  * existing ids; upsert freely mixes); persistence cycles through a cold
  * `getCollection` reopen so the machine crosses the WAL → segment →
  * replay boundary repeatedly, and forks copy-on-write mid-sequence
  * exactly like `test_embeddings.py`'s fork rule. A dedicated CRASH op
  * (`chromadb/test/property/test_persist.py`'s kill/reopen; wal3's
  * orphaned-claim recovery) dies between the compaction's
  * conditional-store publish and the version swap — orphaning the commit
  * claim, partial segment data, and a WAL append claim — then reopens
  * cold and must satisfy the same invariants, unblock via the GC sweep,
  * and compact successfully.
  */
class ApiStateMachineSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val Dim = 4

  private final case class ModelRec(doc: String, meta: Map[String, String],
      emb: Seq[Float])

  private def emb(rnd: scala.util.Random): Seq[Float] =
    Seq.fill(Dim)(rnd.nextFloat() * 2f - 1f)

  private def recDf(rows: Seq[(String, ModelRec)]) =
    rows.map { case (id, r) => (id, r.doc, r.meta, r.emb) }
      .toDF("id", "document", "meta", "embedding")

  /** Exact cosine top-k over the model — the brute-force ground truth
    * (`invariants.py:222` _exact_distances).
    */
  private def trueTopK(model: Map[String, ModelRec], q: Seq[Float],
      k: Int): Set[String] = {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    model.toSeq.sortBy { case (id, r) => (-cos(r.emb, q), id) }
      .take(k).map(_._1).toSet
  }

  private def checkRoundTrip(h: CollectionHandle,
      model: Map[String, ModelRec], ctx: String): Unit = {
    assert(h.count() == model.size, s"$ctx: count mismatch")
    val got = h.get(include = Seq("document", "meta_str", "embedding"))
      .collect().map { r =>
        r.getString(0) -> ((r.getString(1),
          Option(r.getMap[String, String](2)).map(_.toMap)
            .getOrElse(Map.empty),
          r.getSeq[Float](3)))
      }.toMap
    assert(got.keySet == model.keySet,
      s"$ctx: ids diverged — only-got=${(got.keySet -- model.keySet).take(3)}" +
        s" only-model=${(model.keySet -- got.keySet).take(3)}")
    for ((id, m) <- model) {
      val (d, mm, e) = got(id)
      assert(d == m.doc, s"$ctx: document of $id diverged: '$d' vs '${m.doc}'")
      assert(mm == m.meta, s"$ctx: metadata of $id diverged: $mm vs ${m.meta}")
      assert(e == m.emb, s"$ctx: embedding of $id diverged")
    }
  }

  /** `invariants.py:281` ann_accuracy: every stored embedding queries
    * the collection; recall of the true cosine top-k must be ≥ 0.95.
    * Runs BOTH the exact in-plan KNN and (when a segment exists) the
    * served HNSW path with its IndexAndWal tail merge.
    */
  private def checkAnnAccuracy(h: CollectionHandle,
      model: Map[String, ModelRec], served: Boolean, ctx: String): Unit = {
    if (model.isEmpty) return
    val k = math.min(3, model.size)
    val sample = model.toSeq.sortBy(_._1).take(8)
    val queries = sample.zipWithIndex
      .map { case ((_, r), i) => (i.toLong, r.emb) }
      .toDF("query_id", "q_embedding")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val byQ = df.select("query_id", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
      val hits = sample.zipWithIndex.map { case ((_, r), i) =>
        val truth = trueTopK(model, r.emb, k)
        (byQ.getOrElse(i.toLong, Set.empty) intersect truth).size.toDouble /
          truth.size
      }
      hits.sum / hits.size
    }
    val exact = recallOf(h.query(queries, k, space = "cosine"))
    assert(exact >= 0.95, s"$ctx: exact KNN recall $exact < 0.95")
    if (served) {
      val ann = recallOf(h.queryAnnHnsw(queries, k, space = "cosine"))
      assert(ann >= 0.95, s"$ctx: served HNSW recall $ann < 0.95")
    }
  }

  test("50 random API interleavings hold count/round-trip/ann invariants at every step") {
    val master = new scala.util.Random(0xC0FFEE)
    val seeds = Seq.fill(50)(master.nextLong())
    // sequences are fully independent (own client root, own collection) —
    // run them on a pool so 50 machines of tiny driver-latency-bound jobs
    // share the local scheduler instead of serializing ~14 min of
    // per-step actions
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = seeds.zipWithIndex.map { case (seed, si) =>
      scala.concurrent.Future(runSequence(seed, si))
    }
    try
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(20, "min"))
    finally pool.shutdown()
  }

  private def runSequence(seed: Long, si: Int): Unit = {
    {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files.createTempDirectory("apism").toString
      val client = new Client(spark, root)
      var name = s"m$si"
      var h = client.createCollection(name)
      var model = Map.empty[String, ModelRec]
      var persisted = false
      var nextId = 0
      def freshIds(n: Int): Seq[String] =
        (0 until n).map { _ => nextId += 1; s"id$nextId" }
      def existing(n: Int): Seq[String] =
        rnd.shuffle(model.keys.toSeq).take(n)
      def randMeta(): Map[String, String] =
        Seq("lang" -> Seq("en", "de", "fr")(rnd.nextInt(3)),
          "src" -> s"s${rnd.nextInt(4)}")
          .take(1 + rnd.nextInt(2)).toMap
      def mkRecs(ids: Seq[String]): Seq[(String, ModelRec)] =
        ids.map(id => id -> ModelRec(s"doc $id ${rnd.nextInt(100)}",
          randMeta(), emb(rnd)))

      val steps = 12 + rnd.nextInt(6)
      for (step <- 0 until steps) {
        val ctx = s"seq $si (seed $seed) step $step"
        rnd.nextInt(11) match {
          case 0 | 1 | 2 => // add new ids
            val recs = mkRecs(freshIds(1 + rnd.nextInt(4)))
            h.add(recDf(recs))
            model ++= recs
          case 3 => // upsert: mix of existing and new
            val recs = mkRecs(existing(rnd.nextInt(3)) ++
              freshIds(1 + rnd.nextInt(2)))
            if (recs.nonEmpty) { h.upsert(recDf(recs.distinctBy(_._1)))
              model ++= recs.distinctBy(_._1) }
          case 4 => // update existing: new doc+meta+embedding per id;
                    // provided meta keys overwrite, absent keys survive
            val ids = existing(1 + rnd.nextInt(2))
            if (ids.nonEmpty) {
              val recs = mkRecs(ids)
              h.update(recDf(recs))
              model = model ++ recs.map { case (id, r) =>
                id -> r.copy(meta = model(id).meta ++ r.meta) }
            }
          case 5 => // delete existing ids
            val ids = existing(1 + rnd.nextInt(2))
            if (ids.nonEmpty) { h.delete(ids); model --= ids }
          case 6 => // predicate delete (the frontend's where-delete)
            val lang = Seq("en", "de", "fr")(rnd.nextInt(3))
            val n = h.deleteWhere(Where.Cmp("lang", "$eq", Where.VStr(lang)))
            val hit = model.filter(_._2.meta.get("lang").contains(lang)).keySet
            assert(n == hit.size, s"$ctx: deleteWhere count $n != ${hit.size}")
            model --= hit
          case 7 => // compact
            h.persist(); persisted = true
          case 8 => // crash + cold reopen (replays segment + WAL)
            h.persist() // this machine reopens from the compacted state
            h = client.getCollection(name)
            persisted = true
          case 9 => // fork copy-on-write, continue the machine on the fork
            h.persist()
            val dst = s"$name-f$step"
            h = client.forkCollection(name, dst)
            name = dst
            persisted = true
          case 10 =>
            // CRASH MID-COMPACTION (test_persist.py's kill/reopen, wal3
            // orphan recovery): durable-publish the acked writes, then a
            // compactor claims the next version slot and writes its
            // segment but DIES before the claim→marker swap — and a WAL
            // appender dies holding the next log position's claim. A
            // cold reopen must serve the PREVIOUS version + full log
            // replay; the orphaned commit claim blocks the slot LOUDLY
            // until the GC sweep voids it (claim + partial data +
            // stale append claim), after which compaction succeeds.
            h.commitLog() // the crash kills only un-acked writes
            val dataRoot = h.ref.dataRoot
            val vdir = java.nio.file.Paths.get(dataRoot, "_versions")
            java.nio.file.Files.createDirectories(vdir)
            val next = graft.sources.CollectionStore.currentVersion(dataRoot) + 1
            java.nio.file.Files.createFile(vdir.resolve(s"v$next.claim"))
            val partial = java.nio.file.Paths.get(dataRoot, s"v$next", "records")
            java.nio.file.Files.createDirectories(partial)
            java.nio.file.Files.write(partial.resolve("part-half.parquet"),
              Array[Byte](0x50, 0x41, 0x52)) // truncated mid-write
            val walMarkers = java.nio.file.Paths.get(dataRoot, "_wal", "_entries")
            java.nio.file.Files.createDirectories(walMarkers)
            val nextLog = (graft.sources.CollectionStore.listDir(walMarkers)
              .map(_.getFileName.toString)
              .collect { case s if s.matches("b\\d+") => s.drop(1).toLong } :+ -1L)
              .max + 1
            java.nio.file.Files.createFile(walMarkers.resolve(s"b$nextLog.claim"))
            // drop the in-memory client entirely: a NEW process opens cold
            h = new Client(spark, root).getCollection(name)
            checkRoundTrip(h, model, s"$ctx (post-crash reopen)")
            // the orphaned claim blocks the version slot — loudly
            intercept[java.util.ConcurrentModificationException] { h.persist() }
            h.gcVersions(keepLast = 2, staleClaimAgeMs = 0) // the sweep
            h.persist() // slot freed: compaction completes
            persisted = true
        }
        checkRoundTrip(h, model, ctx)
        val annStep = step == steps - 1 ||
          (rnd.nextInt(10) match { case s if s >= 7 => true; case _ => false })
        if (annStep) checkAnnAccuracy(h, model, persisted, ctx)
      }
    }
  }
}
