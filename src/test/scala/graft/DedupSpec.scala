package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the approximate dedup paths (the driver's oracle only
  * rows-checks these): LSH output must be a subset of the exact pairs with
  * high recall; simhash must be deterministic and rank near-dups closer
  * than random pairs.
  */
class DedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("minhash LSH verified pairs == subset of exact jaccard pairs, recall >= 0.9") {
    val exact = Dedup.jaccardPairs(docs, 0.5).select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, 0.5).select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-pairs: ${lsh -- exact}")
    assert(exact.nonEmpty, "test data has no near-dup pairs?")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (${lsh.size}/${exact.size})")
  }

  test("bloom probe: no false negatives, prunes fresh rows, output exact") {
    // batch = K re-ingested rows (must all survive the blooms and match)
    // + M certainly-fresh rows (survive only at ~fpp rate)
    val reingested = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("batch_id"), col("text"))
    val fresh = docs.filter(col("doc_id") % 7 === 1)
      .select((col("doc_id") + 1000000L).as("batch_id"),
        concat(col("text"), lit(" fresh")).as("text"))
    val batch = reingested.unionByName(fresh)
    val idx = Dedup.buildBloomIndex(docs, partitions = 8, fpp = 0.01)

    // row-identical to the unfiltered exact probe
    val viaBloom = Dedup.bloomExactProbe(batch, docs, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = batch.join(docs.select(col("doc_id"), col("text")),
        Seq("text")).select(col("batch_id"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom == exact, "bloom-prefiltered probe diverged from exact")
    assert(exact.nonEmpty, "no re-ingested matches — bad fixture?")

    // pruning: every re-ingested row survives (no false negatives);
    // fresh rows pass only as false positives, bounded well under the
    // 1% design point with slack for small-sample variance
    val survivors = Dedup.bloomSurvivors(batch, idx)
    val nRe = reingested.count()
    val nFresh = fresh.count()
    val nSurv = survivors.count()
    assert(nSurv >= nRe, s"false negatives: $nSurv < $nRe")
    val fpObserved = (nSurv - nRe).toDouble / math.max(nFresh, 1L)
    assert(fpObserved <= 0.05,
      s"false-positive rate $fpObserved over 5x the 1% design point " +
        s"($nSurv survivors, $nRe true, $nFresh fresh)")
  }

  test("partitioned bloom probe == broadcast probe row-identical; " +
      "served routing picks it past the byte threshold") {
    // same fixture shape as the broadcast test, but probed through the
    // PERSISTED index with per-pid slice-local deserialization — the
    // >broadcast-range path where nothing index-sized transits the driver
    val reingested = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("batch_id"), col("text"))
    val fresh = docs.filter(col("doc_id") % 7 === 1)
      .select((col("doc_id") + 1000000L).as("batch_id"),
        concat(col("text"), lit(" fresh")).as("text"))
    val batch = reingested.unionByName(fresh)
    val root = java.nio.file.Files.createTempDirectory("bloom_part").toString
    Dedup.saveBloomIndex(docs.filter(col("doc_id") % 3 =!= 0), root,
      partitions = 8, fpp = 0.01)
    // stream-shaped deltas on top of the base, including a doc set that
    // can populate delta-only pids
    val deltas = Dedup.bloomDeltaFps(docs.filter(col("doc_id") % 3 === 0), 8)
    deltas.write.mode("overwrite")
      .parquet(s"${Dedup.bloomDeltasDir(root)}/batch=0")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("batch_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaBroadcast = key(Dedup.bloomSurvivors(batch,
      Dedup.loadBloomIndex(spark, root)))
    val viaPartitioned = key(Dedup.bloomSurvivorsPartitioned(batch, root))
    assert(viaPartitioned == viaBroadcast,
      "partitioned slice-local probe diverged from the broadcast probe")
    // routing: a tiny index serves via broadcast; the same call must
    // route partitioned when the index is over the byte ceiling
    assert(Dedup.bloomIndexBytes(root) <= Dedup.BloomBroadcastMaxBytes)
    assert(key(Dedup.bloomSurvivorsServed(batch, root)) == viaBroadcast)
  }

  test("bucket cap bounds pair output, keeps every member covered and connected") {
    // a planted cluster LARGER than the cap: m near-identical docs would
    // emit m(m-1)/2 pairs uncapped — the cap must (a) bound the output to
    // O(cap² + m), (b) still surface EVERY member in >= 1 verified pair
    // (star-edge degradation), (c) keep the cluster connected, and (d) be
    // a strict subset of the uncapped listing (precision unchanged —
    // every emitted pair is still exact-Jaccard-verified). Small corpora
    // (all buckets <= cap) must be bit-identical to the uncapped form.
    import spark.implicits._
    val m = 40
    val big = (0 until m).map(i => (1000L + i,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4))
    val singles = (0 until 20).map(i => (2000L + i,
      s"unique_${i}_a unique_${i}_b unique_${i}_c unique_${i}_d " +
        s"unique_${i}_e unique_${i}_f unique_${i}_g unique_${i}_h"))
    val corpus = (big ++ singles).toDF("doc_id", "text")
    val cap = 8
    val capped = Dedup.minhashLsh(corpus, threshold = 0.9, maxBucket = cap)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.minhashLsh(corpus, threshold = 0.9,
        maxBucket = Int.MaxValue)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == m * (m - 1) / 2,
      s"planted cluster should emit all pairs uncapped, got ${uncapped.size}")
    // (d) precision: capped pairs are a subset of the exhaustive listing
    assert(capped.subsetOf(uncapped),
      s"cap invented pairs: ${(capped -- uncapped).take(3)}")
    // (a) bounded: cap² all-pairs + (m - cap) star edges per bucket, and
    // the bands all collide on the same doc set here, so the distinct
    // union stays within one bucket's bound
    assert(capped.size <= cap * (cap - 1) / 2 + (m - cap),
      s"capped output ${capped.size} exceeds the per-bucket bound")
    // (b) coverage: every planted member appears in >= 1 verified pair
    val covered = capped.flatMap(p => Seq(p._1, p._2))
    assert(big.map(_._1).forall(covered),
      s"cap dropped members entirely: ${big.map(_._1).filterNot(covered).take(3)}")
    // (c) connectivity: the capped edge set keeps the cluster in ONE
    // component (star edges anchor every overflow member to the min)
    val adj = capped.toSeq.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
      .groupMap(_._1)(_._2)
    val seen = scala.collection.mutable.Set(1000L)
    val stack = scala.collection.mutable.Stack(1000L)
    while (stack.nonEmpty)
      adj.getOrElse(stack.pop(), Nil).foreach(n =>
        if (seen.add(n)) stack.push(n))
    assert(big.map(_._1).forall(seen),
      "capped edges disconnected the planted cluster")
    // small-bucket equality: the real corpus's buckets sit far below the
    // serving cap, so the capped default == the explicit exhaustive
    // listing (the cap only bites on adversarial buckets)
    val srv = Dedup.minhashLsh(docs, 0.5, maxBucket = Dedup.DefaultMaxBucket)
      .select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exh = Dedup.minhashLsh(docs, 0.5, maxBucket = Int.MaxValue)
      .select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(srv == exh, "serving cap changed output on a small-bucket corpus")
  }

  test("LSH probe == full pipeline restricted to batch-touching pairs") {
    // same collision criterion, probe-side narrowed — the probe must find
    // EXACTLY the full run's pairs that touch the arriving batch
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val probe = Dedup.minhashLshProbe(batch, docs, Dedup.bandedRows(docs),
        threshold = 0.5)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the probe's batch×table join is inherently uncapped — compare
    // against the exhaustive listing, not the capped serving default
    val full = Dedup.minhashLsh(docs, threshold = 0.5,
        maxBucket = Int.MaxValue)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(probe == full,
      s"probe != restricted full: only-probe=${(probe -- full).take(3)} " +
        s"only-full=${(full -- probe).take(3)}")
  }

  test("LSH star-edge clusters: precision 1 (refinement) and pair recall >= 0.95") {
    // star candidates verify true Jaccard, so star edges are a SUBSET of
    // the exact threshold graph — star components can only refine the
    // full components (no over-merge), and must recover >= 95% of the
    // full co-cluster pairs
    def coPairs(labels: Map[Long, Long]): Set[(Long, Long)] =
      labels.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- i + 1 until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    val star = Dedup.minhashLshClusters(docs, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.dupClusters(docs, threshold = 0.5)
      .select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      .withDefault(identity) // singletons self-cluster
    val fullAll = star.keys.map(id => id -> full(id)).toMap
    val (sp, fp) = (coPairs(star), coPairs(fullAll))
    assert((sp -- fp).isEmpty,
      s"star over-merged: ${(sp -- fp).take(3)}") // precision 1
    val recall = if (fp.isEmpty) 1.0 else (sp & fp).size.toDouble / fp.size
    assert(recall >= 0.95, s"star cluster pair recall $recall < 0.95")
  }

  test("LSH probe rejects a banded table built with a different band count") {
    // a probe whose (bands, rows) disagree with the table's build would
    // silently join to zero candidates — the band-count mismatch the
    // table itself reveals must fail loudly instead
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val table = Dedup.bandedRows(docs, bands = 8, rows = 8) // 8-band build
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshProbe(batch, docs, table, threshold = 0.5) // 16-band probe
    }
    assert(e.getMessage.contains("bands"), e.getMessage)
    // and the params sidecar round-trips for the (rows, n) dimensions the
    // table alone cannot reveal
    val dir = java.nio.file.Files.createTempDirectory("lsh_params").toString
    Dedup.writeLshParams(dir, n = 5, bands = 8, rows = 8)
    assert(Dedup.readLshParams(dir).contains((5, 8, 8)))
  }

  test("served probe validates ALL build params from the sidecar, then matches") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_served").toString
    Dedup.bandedRows(docs).repartition(col("band"))
      .write.mode("overwrite").partitionBy("band").parquet(dir)
    Dedup.writeLshParams(dir, n = 3, bands = 16, rows = 4)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    // metadata-cost validation passes and the result equals the
    // DataFrame-variant probe over the same table
    val served = Dedup.minhashLshProbeServed(batch, docs, dir, threshold = 0.5)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Dedup.minhashLshProbe(batch, docs,
        spark.read.parquet(dir).select("doc_id", "band", "bkey"),
        threshold = 0.5)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == direct)
    // a (rows, n) mismatch the band count CANNOT reveal fails loudly
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshProbeServed(batch, docs, dir, threshold = 0.5,
        n = 5, bands = 16, rows = 4)
    }
    assert(e.getMessage.contains("built with"), e.getMessage)
  }

  test("embedding probe == threshold-pair graph restricted to batch-touching pairs") {
    import graft.operators.Ivf
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("offset_id"), col("embedding"))
    val model = Ivf.build(vecs, nCentroids = 8, nReplica = 2)
    model.centroids.cache().count()
    val batchIds = vecs.filter(col("offset_id") % 5 === 0)
      .select("offset_id").collect().map(_.getLong(0)).toSet
    val probe = Dedup.embeddingProbePairs(
        vecs.filter(col("offset_id") % 5 === 0), model,
        threshold = 0.4, nReplica = 2)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.embeddingThresholdPairs(model, 0.4)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(probe == full,
      s"probe != restricted graph: only-probe=${(probe -- full).take(3)} " +
        s"only-full=${(full -- probe).take(3)}")
  }

  test("ingest clean: survivors are batch docs; fully-unique long docs pass intact") {
    val all = docs.select(col("doc_id"), col("text"))
    val batch = all.filter(col("doc_id") % 5 === 0)
    val corpus = all.filter(col("doc_id") % 5 =!= 0)
    val out = Dedup.ingestClean(batch, corpus).cache()
    val outRows = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outRows.keySet.subsetOf(batchIds), "survivor outside the batch")

    // a batch doc is untouchable iff its digest is unique and every one
    // of its segments occurs exactly once corpus-wide — it must survive
    // verbatim (given it meets the length floor)
    val segAll = Dedup.segmentRows(all, 8)
    val dupDocs = segAll.join(
        segAll.groupBy("seg").count().filter(col("count") > 1).select("seg"),
        "seg").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val dupDigest = all.withColumn("dg", md5(col("text")))
      .groupBy("dg").agg(count(lit(1)).as("c"), collect_list("doc_id").as("ids"))
      .filter(col("c") > 1).select(explode(col("ids")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val untouched = batch
      .filter(size(split(col("text"), " ")) >= 24)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .filter { case (id, _) => !dupDocs(id) && !dupDigest(id) }
    assert(untouched.nonEmpty, "spec vacuous: no fully-unique batch doc")
    untouched.foreach { case (id, text) =>
      assert(outRows.get(id).contains(text),
        s"unique doc $id did not pass through intact")
    }
    out.unpersist()
  }

  test("exact jaccard probe == full pairs restricted to batch-touching") {
    val all = docs.select(col("doc_id"), col("text"))
    val batchIds = all.filter(col("doc_id") % 5 === 0).select("doc_id")
    val probe = Dedup.jaccardProbePairs(batchIds, all, threshold = 0.5)
      .select("da", "db", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ids = batchIds.collect().map(_.getLong(0)).toSet
    val full = Dedup.jaccardPairs(all, threshold = 0.5)
      .select("da", "db", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      .filter(p => ids(p._1) || ids(p._2))
    assert(probe == full,
      s"probe != restricted full: only-probe=${(probe -- full).take(3)} " +
        s"only-full=${(full -- probe).take(3)}")
  }

  test("cluster attach == full re-cluster restricted to batch; merges name retired labels") {
    val all = docs.select(col("doc_id"), col("text"))
    val isBatch = col("doc_id") % 5 === 0
    val labels = Dedup.dupClusters(all.filter(!isBatch), threshold = 0.5)
      .select(col("doc_id"), col("cluster")).cache()
    val pairs = Dedup.jaccardPairs(all, threshold = 0.5)
      .select(col("da"), col("db"))
      .filter(col("da") % 5 === 0 || col("db") % 5 === 0)
    val attach = Dedup.assignToClusters(all.filter(isBatch), pairs, labels)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSet))
    val full = Dedup.dupClusters(all, threshold = 0.5)
      .select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    attach.foreach { case (id, cl, _) =>
      assert(full.getOrElse(id, id) == cl,
        s"doc $id: attach=$cl full=${full.getOrElse(id, id)}")
    }
    // every retired label is an existing corpus label whose members the
    // full fixpoint relabeled to the attach's kept cluster
    val stored = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    attach.foreach { case (_, cl, mf) =>
      mf.foreach { retiredLabel =>
        val members = stored.filter(_._2 == retiredLabel).keys
        assert(members.nonEmpty, s"retired $retiredLabel is not a stored label")
        members.foreach { m =>
          assert(full(m) == cl,
            s"member $m of retired $retiredLabel not relabeled to $cl")
        }
      }
    }
    labels.unpersist()
  }

  test("simhash probe == full pairs restricted to batch-touching") {
    val all = docs.select(col("doc_id"), col("text"))
    val batchIds = all.filter(col("doc_id") % 5 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val probe = Dedup.simhashProbePairs(all.filter(col("doc_id") % 5 === 0),
        Dedup.simhashBandRows(all), maxDist = 6)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.simhashPairs(all, maxDist = 6)
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(probe == full,
      s"probe != restricted full: only-probe=${(probe -- full).take(3)} " +
        s"only-full=${(full -- probe).take(3)}")
  }

  test("simhash is deterministic and near-dups are closer than random pairs") {
    val s1 = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearPairs = Dedup.jaccardPairs(docs, 0.5).select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (nearPairs.nonEmpty) {
      val nearAvg = nearPairs.map { case (a, b) => hamming(s1(a), s1(b)) }.sum.toDouble / nearPairs.length
      val ids = s1.keys.toArray.sorted
      val randAvg = ids.sliding(2, 2).collect { case Array(a, b) => hamming(s1(a), s1(b)) }
        .sum.toDouble / (ids.length / 2)
      assert(nearAvg < randAvg, s"near-dup avg hamming $nearAvg !< random $randAvg")
    }
  }

  test("embedding ANN pairs: recall >= 0.9 vs exact top-20, sims exact on candidates") {
    val vecs = Tables.embeddings(spark, sf)
    val model = graft.operators.Ivf.build(
      vecs.select(col("vec_id").as("offset_id"), col("embedding")),
      nCentroids = 16, nReplica = 4)
    def ps(df: org.apache.spark.sql.DataFrame) =
      df.select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ps(Dedup.embeddingTopPairs(vecs, 20))
    val ann = ps(Dedup.embeddingAnnPairs(model, 20))
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"embedding ANN pair recall $recall < 0.9")
    // candidate sims are computed with the exact kernel: any pair reported
    // by both paths must carry an identical sim value
    val exactSims = Dedup.embeddingTopPairs(vecs, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getFloat(2)).toMap
    Dedup.embeddingAnnPairs(model, 20).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactSims.get(key).foreach(s => assert(s == r.getFloat(2)))
    }
  }

  test("semantic dedup: pairs subset of exact threshold graph, recall >= 0.9, keep = component min") {
    val vecs = Tables.embeddings(spark, sf)
    val model = graft.operators.Ivf.build(
      vecs.select(col("vec_id").as("offset_id"), col("embedding")),
      nCentroids = 16, nReplica = 4)
    val tau = 0.4
    // exact threshold graph from the all-pairs oracle
    val a = vecs.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = vecs.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val exactPairs = a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"),
        graft.functions.Distances.cosineSimilarity(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "no threshold pairs in test data?")
    val annPairs = Dedup.embeddingThresholdPairs(model, tau)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(annPairs.subsetOf(exactPairs), s"false pairs: ${annPairs -- exactPairs}")
    val recall = annPairs.size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"threshold-pair recall $recall < 0.9")
    // keep/drop output: every vector appears once; keep_id is the min of
    // the vector's component in the CANDIDATE graph (union-find twin)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    annPairs.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    val out = Dedup.semanticDedup(vecs, model, tau).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == vecs.count())
    out.foreach { case (id, (keep, isDup)) =>
      assert(keep == find(id), s"vec $id keep_id")
      assert(isDup == (keep != id))
    }
  }

  test("dup clusters == transitive closure of the jaccard pair graph") {
    val pairs = Dedup.jaccardPairs(docs, 0.5).select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    val got = Dedup.dupClusters(docs, 0.5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet)
    // same canonical label (min of component) per node
    got.foreach { case (node, (cluster, csize)) =>
      assert(cluster == expected(node), s"node $node cluster")
      assert(csize == expected.values.count(_ == expected(node)), s"node $node size")
    }
  }

  test("distributed label propagation == driver union-find leg") {
    val pairs = Dedup.jaccardPairs(docs, 0.5).select("da", "db")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // default path (driver union-find at test scale) vs the forced
    // distributed fixpoint — identical (node, min-label) sets
    val viaDriver = key(Dedup.connectedComponents(pairs))
    val viaDist = key(Dedup.connectedComponents(pairs, driverMaxPairs = 0))
    assert(viaDriver.nonEmpty, "no pairs in test data?")
    assert(viaDriver == viaDist,
      s"legs diverge: only-driver=${(viaDriver -- viaDist).take(5)} " +
        s"only-dist=${(viaDist -- viaDriver).take(5)}")
  }

  test("pii redaction removes every counted pattern occurrence") {
    import spark.implicits._
    val rows = Seq(
      "mail a.b-c_d@ex-ample.co.uk and 1-234-5678 plus 10.20.30.40 done",
      "no pii here at all",
      "+421-123-456-7890 twice +1-800-555-1234 and x@y.io").toDF("t")
    val out = rows.select(
      graft.operators.TextStats.redactPii(col("t")).as("red"),
      graft.operators.TextStats.piiCount(col("t"), "email").as("ne"),
      graft.operators.TextStats.piiCount(col("t"), "phone").as("np"),
      graft.operators.TextStats.piiCount(col("t"), "ipv4").as("ni")).collect()
    assert(out(0).getString(0) == "mail <EMAIL> and <PHONE> plus <IP> done")
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3)) == ((1, 1, 1)))
    assert(out(1).getString(0) == "no pii here at all")
    assert((out(1).getInt(1), out(1).getInt(2), out(1).getInt(3)) == ((0, 0, 0)))
    assert(out(2).getString(0) == "<PHONE> twice <PHONE> and <EMAIL>")
    assert(out(2).getInt(2) == 2)
    // redacted text never still matches any pattern
    graft.operators.TextStats.piiPatterns.foreach { case (kind, _, _) =>
      out.foreach { r =>
        val recount = rows.sparkSession.range(1)
          .select(graft.operators.TextStats.piiCount(lit(r.getString(0)), kind))
          .collect()(0).getInt(0)
        assert(recount == 0, s"$kind still present after redaction")
      }
    }
  }

  test("exact dedup: every keep_id is the group minimum and non-dups map to self") {
    val out = Dedup.exact(docs).collect()
    assert(out.forall(r => r.getLong(1) <= r.getLong(0)))
    val dups = out.count(_.getBoolean(2))
    val distinctTexts = docs.select(countDistinct(col("text"))).collect()(0).getLong(0)
    assert(out.length - dups == distinctTexts)
  }

  test("substring dedup: planted passage removed at any offset, first kept") {
    import spark.implicits._
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val fixture = Seq(
      // first corpus occurrence of the passage — must survive intact
      (1L, s"u1 u2 $passage u3"),
      // same passage at a DIFFERENT offset (prefix of 5 words) — the
      // aligned-segment rule misses this; sliding windows must cut
      // exactly the 10 passage words and nothing else
      (2L, s"v1 v2 v3 v4 v5 $passage v6 v7"),
      // two distinct removed runs -> n_spans = 2
      (3L, s"$passage w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 $passage"),
      // shorter than k -> untouched, no windows
      (4L, "short doc only")).toDF("doc_id", "text")
    val out = Dedup.substringDedup(fixture, k = 10)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // doc 1: earliest (doc_id, start) occurrence -> nothing removed
    assert(out(0).getLong(2) == 0L && out(0).getString(4) == s"u1 u2 $passage u3")
    // doc 2: exactly the 10 passage words removed, one contiguous span
    assert(out(1).getLong(2) == 10L && out(1).getLong(3) == 1L)
    assert(out(1).getString(4) == "v1 v2 v3 v4 v5 v6 v7")
    // doc 3: its FIRST copy is also a corpus duplicate (doc 1 came
    // first), so both copies go -> 20 removed in 2 spans
    assert(out(2).getLong(2) == 20L && out(2).getLong(3) == 2L)
    assert(out(2).getString(4) == (1 to 10).map(i => s"w$i").mkString(" "))
    // doc 4: below k, untouched
    assert(out(3).getLong(2) == 0L && out(3).getString(4) == "short doc only")
  }

  test("substring dedup equals a brute-force oracle on random duplicate-rich docs") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val k = 4
    // tiny vocabulary + short docs => sliding windows collide constantly
    val genDocs = Gen.listOfN(15, Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    for (it <- 0 until 3) {
      val texts = genDocs(Gen.Parameters.default, Seed(42L + it)).get
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // brute force: windows -> global first by (doc_id, start) -> covered
      val wins = for {
        (id, t) <- docs
        toks = t.split(" ", -1) // split("x","") == [""] like Spark's
        if toks.length >= k
        s <- 0 to toks.length - k
      } yield (id, s, toks.slice(s, s + k).mkString(" "))
      val firsts = wins.groupBy(_._3).map { case (_, occ) => occ.minBy(o => (o._1, o._2)) }.toSet
      val covered = wins.filterNot(firsts).flatMap { case (id, s, _) =>
        (s until s + k).map(id -> _) }.toSet
      val exp = docs.map { case (id, t) =>
        val toks = t.split(" ", -1)
        val keptIdx = toks.indices.filterNot(i => covered(id -> i))
        val nSpans = toks.indices.count(i =>
          covered(id -> i) && !covered(id -> (i - 1)))
        (id, toks.length.toLong, (toks.length - keptIdx.length).toLong,
          nSpans.toLong, keptIdx.map(toks).mkString(" "))
      }.toSet
      val got = Dedup.substringDedup(docs.toDF("doc_id", "text"), k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
      assert(got == exp, s"case $it: only-got=${(got -- exp).take(3)} " +
        s"only-exp=${(exp -- got).take(3)}")
    }
  }

  test("substring probe equals corpus-first full run restricted to batch, on random docs") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val k = 4
    val genDocs = Gen.listOfN(18, Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    for (it <- 0 until 2) {
      val texts = genDocs(Gen.Parameters.default, Seed(7L + it)).get
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (batch, corpus) = docs.partition(_._1 % 3 == 0)
      // brute-force oracle: corpus occurrences rank ahead of any batch
      // occurrence regardless of doc_id; batch rows removed if not first
      val wins = for {
        ((id, t), inBatch) <- docs.map(d => d -> (d._1 % 3 == 0))
        toks = t.split(" ", -1)
        if toks.length >= k
        s <- 0 to toks.length - k
      } yield (inBatch, id, s, toks.slice(s, s + k).mkString(" "))
      val firsts = wins.groupBy(_._4)
        .map { case (_, occ) => occ.minBy(o => (o._1, o._2, o._3)) }.toSet
      val covered = wins.filter(w => w._1 && !firsts(w))
        .flatMap { case (_, id, s, _) => (s until s + k).map(id -> _) }.toSet
      val exp = batch.map { case (id, t) =>
        val toks = t.split(" ", -1)
        val keptIdx = toks.indices.filterNot(i => covered(id -> i))
        (id, toks.length.toLong, (toks.length - keptIdx.length).toLong,
          keptIdx.map(toks).mkString(" "))
      }.toSet
      val got = Dedup.substringProbe(batch.toDF("doc_id", "text"),
          corpus.toDF("doc_id", "text"), k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
        .toSet
      assert(got == exp, s"case $it: only-got=${(got -- exp).take(3)} " +
        s"only-exp=${(exp -- got).take(3)}")
    }
  }

  test("substring probe: corpus-first priority, within-batch order, corpus untouched") {
    import spark.implicits._
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val other = (1 to 10).map(i => s"q$i").mkString(" ")
    // corpus doc ids are HIGHER than batch ids — corpus-first priority
    // must still win (it's a served-state rule, not a doc_id rule)
    val corpus = Seq((100L, s"c1 $passage c2")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, s"b1 b2 $passage"), // dup'd vs corpus -> cut
      (2L, other), // first batch occurrence of `other` -> kept
      (3L, s"x1 $other")) // later batch occurrence -> cut
      .toDF("doc_id", "text")
    val out = Dedup.substringProbe(batch, corpus, k = 10)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      "output is batch docs only")
    assert(out(0).getLong(2) == 10L && out(0).getString(4) == "b1 b2")
    assert(out(1).getLong(2) == 0L && out(1).getString(4) == other)
    assert(out(2).getLong(2) == 10L && out(2).getString(4) == "x1")
  }

  test("span dedup: kept segments across the corpus = each distinct segment exactly once") {
    val span = 5
    val out = Dedup.spanDedup(docs, span)
    // every distinct corpus segment survives exactly once, so the kept
    // texts re-split into spans are a permutation of the distinct segments
    val keptSegs = out.filter(length(col("kept_text")) > 0)
      .select(posexplode(split(col("kept_text"), " ")).as(Seq("wi", "word")),
        col("doc_id"))
      .withColumn("seg_idx", floor(col("wi") / span))
      .groupBy("doc_id", "seg_idx")
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(wi, word))), x -> x.word)"),
        " ").as("seg"))
      .groupBy("seg").count()
    assert(keptSegs.filter(col("count") =!= 1).count() == 0,
      "some segment kept more than once")
    val distinctSegs = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("wi", "word")))
      .withColumn("seg_idx", floor(col("wi") / span))
      .groupBy("doc_id", "seg_idx")
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(wi, word))), x -> x.word)"),
        " ").as("seg"))
      .select("seg").distinct().count()
    assert(keptSegs.count() == distinctSegs,
      "kept segment set != distinct corpus segments")
    // counts reconcile: kept + dropped per doc == that doc's segment count
    val bad = out.join(
      docs.select(col("doc_id"),
        (floor((size(split(col("text"), " ")) - 1) / span) + 1).as("n_segs")),
      "doc_id")
      .filter(col("n_kept") + col("n_dropped") =!= col("n_segs"))
    assert(bad.count() == 0, "kept+dropped != segment count for some doc")
  }
}
