package graft.operators

import graft.functions.Distances
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines: exact, shingle-Jaccard,
  * MinHash+LSH, SimHash. All set up as shuffle-lean DataFrame plans.
  *
  * Scale notes (100 TB):
  *   - exact: one hash-shuffle on the digest — the cheapest possible form.
  *   - jaccard: inverted-index self-join on shingles. The skew killer is
  *     frequent shingles (df² pair blowup), so [[jaccardPairs]] takes a
  *     `maxDf` cap dropping shingles whose document frequency exceeds it —
  *     standard practice (a shingle shared by >maxDf docs carries ~no
  *     similarity signal). At our SFs the cap is above the observed max df,
  *     so results stay exact and oracle-checkable.
  *   - minhash LSH: fixed 16 bands x 4 rows; candidate generation touches
  *     only band-key collisions, verification re-checks true Jaccard, so
  *     output precision is exact and recall is 1-(1-j^4)^16.
  *   - simhash: 64-bit signature per doc + banded Hamming candidates.
  */
object Dedup {

  /** doc -> (doc_id, tokens, shingles) prep used by all text variants. */
  def withShingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    docs.select(col("doc_id"), TextStats.shingles(toks, n).as("shingles"))
  }

  /** Exact dedup: canonical id per identical text (md5 group). */
  def exact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    docs.select(col("doc_id"),
      min(col("doc_id")).over(w).as("keep_id"))
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
  }

  /** Shingles with document frequency above this carry ~no similarity
    * signal but drive the df² pair blowup in the inverted-index join; the
    * default cap is set where it actually fires on skewed corpora (a real
    * protection, not a vacuous bound). [[graft.queries.DedupPack]] mirrors
    * the same cap in its DuckDB oracle so results stay hash-exact even
    * when shingles are dropped.
    */
  val DefaultMaxDf: Long = 10000L

  /** N-gram Jaccard pairs with similarity >= `threshold`, via an
    * inverted-index join on shingles (df-capped at `maxDf`; dropped
    * shingles only reduce the intersection count, set sizes stay full —
    * the estimate is precision-biased).
    */
  def jaccardPairs(docs: DataFrame, threshold: Double, n: Int = 3,
      maxDf: Long = DefaultMaxDf): DataFrame = {
    // The exploded (doc_id, xxhash64(shingle)) table is what every
    // downstream step consumes — cache THAT, not the array<string>
    // column (columnar-caching string arrays costs multiples of the
    // recompute, measured here; two longs per row compress to ~nothing).
    // Hashing shingles to 64-bit ids up front keeps the self-join
    // shuffle narrow; intersection counts are unchanged absent a 64-bit
    // collision (~10^-9 at corpus scale). At cluster scale this cached
    // table is the persisted inverted index.
    val sh = withShingles(docs, n)
    val ex0 = graft.sources.CollectionStore.cacheOnce(
      sh.select(col("doc_id"), explode(col("shingles")).as("sg0"))
        .select(col("doc_id"), xxhash64(col("sg0")).as("sg")))
    val sizes = ex0.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val dfreq = ex0.groupBy("sg").agg(count(lit(1)).as("df"))
    // the dropped-shingle census is an extra full pass over the inverted
    // index — run it only when the operator's logger asks for it
    val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")
    if (log.isInfoEnabled) {
      val dropped = dfreq.filter(col("df") > maxDf).count()
      if (dropped > 0)
        log.info(s"jaccardPairs: dropping $dropped shingles with df > $maxDf")
    }
    // df >= 2: a shingle in exactly one doc can't form a pair — dropping
    // it is exact and removes the (typically dominant) unique-shingle mass
    // from the self-join.
    // Semi-join as a SHUFFLE join, never a broadcast: `rare` is the
    // vocabulary (every shingle with 2 <= df <= maxDf) — at corpus scale
    // that's billions of rows, so broadcasting it OOMs the driver long
    // before the self-join runs. Both sides hash-partition on `sg` (the
    // same key the pair self-join shuffles on, so the exchange is reused)
    // and AQE layers a runtime bloom filter on top when profitable.
    val rare = dfreq.filter(col("df") <= maxDf && col("df") >= 2).select("sg")
    val ex = ex0.join(rare.hint("shuffle_hash"), Seq("sg"), "left_semi")
    val a = ex.as("a"); val b = ex.as("b")
    val inter = a.join(b,
        col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n_sh", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n_sh", "nb"), "db")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("inter"), col("na").cast("long").as("na"),
        col("nb").cast("long").as("nb"), col("jaccard"))
  }

  /** Edit-distance verification of near-dup candidates — the
    * ORDER-SENSITIVE complement to Jaccard: shingle-set overlap treats a
    * document and its token-level paraphrase alike, while Levenshtein
    * similarity `1 − lev(a,b)/max(|a|,|b|)` penalizes reorderings and
    * rewrites, so a low-Jaccard-threshold candidate pass re-verified by
    * edit similarity separates true byte-level near-dups from
    * same-vocabulary documents. Candidates come from the df-capped
    * inverted index ([[jaccardPairs]] at `candidateThreshold`) — the
    * O(len²)-per-pair Levenshtein only ever runs on candidate pairs,
    * never corpus²; the two text joins are keyed shuffles on the pair
    * endpoints. Output (`da`, `db`, `jaccard`, `lev`, `edit_sim`) for
    * pairs with `edit_sim >= simThreshold`.
    */
  def editSimilarityVerify(docs: DataFrame, candidateThreshold: Double = 0.05,
      simThreshold: Double = 0.8, n: Int = 3,
      maxDf: Long = DefaultMaxDf): DataFrame =
    levVerify(jaccardPairs(docs, candidateThreshold, n, maxDf),
      docs, simThreshold)

  /** [[editSimilarityVerify]]'s ingest-time face: candidates from
    * [[jaccardProbePairs]] (|batch postings| × df work, never corpus²),
    * the same Levenshtein re-verification. Row-identical to the
    * corpus-wide form restricted to batch-touching pairs, because the
    * probe's pair set is.
    */
  def editSimilarityProbe(batchIds: DataFrame, docs: DataFrame,
      candidateThreshold: Double = 0.05, simThreshold: Double = 0.8,
      n: Int = 3, maxDf: Long = DefaultMaxDf): DataFrame =
    levVerify(jaccardProbePairs(batchIds, docs, candidateThreshold, n, maxDf),
      docs, simThreshold)

  /** Shared Levenshtein re-verification tail of the edit-similarity
    * family: join pair endpoints to their text, keep pairs with
    * `1 − lev/max(len) >= simThreshold`.
    */
  private def levVerify(pairs: DataFrame, docs: DataFrame,
      simThreshold: Double): DataFrame = {
    val txt = docs.select(col("doc_id"), col("text"))
    pairs
      .select(col("da"), col("db"), col("jaccard"))
      .join(txt.select(col("doc_id").as("da"), col("text").as("ta")), Seq("da"))
      .join(txt.select(col("doc_id").as("db"), col("text").as("tb")), Seq("db"))
      .withColumn("lev", levenshtein(col("ta"), col("tb")))
      .withColumn("edit_sim", lit(1.0) -
        col("lev").cast("double") / greatest(length(col("ta")), length(col("tb"))))
      .filter(col("edit_sim") >= simThreshold)
      .select(col("da"), col("db"), col("jaccard"), col("lev").cast("long").as("lev"),
        col("edit_sim"))
  }

  /** EXACT Jaccard pairs touching an arriving batch — [[jaccardPairs]]
    * with one side of the inverted-index join restricted to the batch's
    * posting rows: |batch postings| × df work instead of df², the exact
    * twin of the approximate [[minhashLshProbe]]. Document frequencies
    * and set sizes come from the FULL corpus (batch included), so the
    * output is row-identical to `jaccardPairs(docs, …)` filtered to
    * batch-touching pairs. Postings derive from [[withShingles]]
    * (`array_distinct`), which the count(1)/2 halving below REQUIRES —
    * see the precondition note on [[jaccardBatchProbeFromHits]].
    */
  def jaccardProbePairs(batchIds: DataFrame, docs: DataFrame,
      threshold: Double, n: Int = 3, maxDf: Long = DefaultMaxDf): DataFrame = {
    val sh = withShingles(docs, n)
    val ex0 = graft.sources.CollectionStore.cacheOnce(
      sh.select(col("doc_id"), explode(col("shingles")).as("sg0"))
        .select(col("doc_id"), xxhash64(col("sg0")).as("sg")))
    val sizes = ex0.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val dfreq = ex0.groupBy("sg").agg(count(lit(1)).as("df"))
    val rare = dfreq.filter(col("df") <= maxDf && col("df") >= 2).select("sg")
    val ex = ex0.join(rare.hint("shuffle_hash"), Seq("sg"), "left_semi")
    val exBatch = ex.join(broadcast(batchIds.select(col("doc_id"))),
      Seq("doc_id"), "left_semi")
    // a batch-batch pair is counted from BOTH sides of the asymmetric
    // join while corpus-batch pairs are hit once — postings are distinct
    // per doc, so a map-side count(1) plus a pair-sized broadcast halving
    // fix-up replaces countDistinct (whose exchange would carry every
    // distinct (da,db,sg) combination instead of partial counts)
    val bIds = batchIds.select(col("doc_id")).distinct()
    val inter = ex.as("a").join(exBatch.as("b"),
        col("a.sg") === col("b.sg") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(least(col("a.doc_id"), col("b.doc_id")).as("da"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(bIds.select(col("doc_id").as("da"),
        lit(true).as("da_b"))), Seq("da"), "left")
      .join(broadcast(bIds.select(col("doc_id").as("db"),
        lit(true).as("db_b"))), Seq("db"), "left")
      .select(col("da"), col("db"), when(col("da_b") && col("db_b"),
        col("cnt") / 2).otherwise(col("cnt")).cast("long").as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n_sh", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n_sh", "nb"), "db")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("inter"), col("na").cast("long").as("na"),
        col("nb").cast("long").as("nb"), col("jaccard"))
  }

  /** The hashed shingle posting rows `(doc_id, sg)` of a document set —
    * the inverted index the Jaccard family joins on, as a persistable
    * table (shingles are distinct per document, so postings are too).
    * Per-document independent: append per-batch outputs and the table
    * is row-identical to one batch build — the property
    * [[graft.streaming.EventStream.clusterMaintain]] relies on to
    * tokenize each document exactly once.
    */
  def shinglePostings(docs: DataFrame, n: Int = 3): DataFrame =
    withShingles(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("sg0"))
      .select(col("doc_id"), xxhash64(col("sg0")).as("sg"))

  /** [[shinglePostings]] with the document's distinct-shingle count
    * carried on EVERY row (`size(shingles)` inline — zero extra shuffle):
    * any posting row of a document then knows its set size, so the
    * ingest-cadence probe needs no per-doc size aggregation or side
    * table at all.
    */
  def shinglePostingsSized(docs: DataFrame, n: Int = 3): DataFrame =
    withShingles(docs, n)
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n_sh"),
        explode(col("shingles")).as("sg0"))
      .select(col("doc_id"), xxhash64(col("sg0")).as("sg"), col("n_sh"))


  /** [[jaccardProbePairs]] over a posting table, with the batch's posting rows IN HAND
    * over a SIZED posting table ([[shinglePostingsSized]]) — the
    * ingest-cadence form [[graft.streaming.EventStream.clusterMaintain]]
    * runs per micro-batch. Row-identical output, a fraction of the
    * work: the corpus side is semi-joined on the batch's shingle set
    * FIRST (shuffle semi — AQE upgrades to broadcast when the batch is
    * small), so the accumulated posting table is touched by one pruning
    * scan per batch; document frequencies for the batch's shingles are
    * still counted over every row carrying them (global df, the same
    * cap semantics); and set sizes ride the posting rows themselves, so
    * no corpus-wide aggregation and no size joins run at all.
    */
  def jaccardBatchProbe(batchPostings: DataFrame, postings: DataFrame,
      threshold: Double, maxDf: Long = DefaultMaxDf): DataFrame =
    jaccardBatchProbeFromHits(batchPostings,
      batchProbeHits(batchPostings, postings), threshold, maxDf)

  /** The probe's pruning scan alone: corpus posting rows carrying any of
    * the batch's shingles — the ONE subplan [[jaccardBatchProbeFromHits]]
    * references twice (df count + pair join). Split out so a caller on
    * the ingest cadence can `persist()` it for the batch's lifetime and
    * halve the corpus scans per micro-batch
    * ([[graft.streaming.EventStream.clusterMaintain]] does).
    */
  def batchProbeHits(batchPostings: DataFrame,
      postings: DataFrame): DataFrame = {
    // the probe side is the BATCH's distinct shingle hashes — bounded by
    // ingest batch size (8 bytes per shingle), never corpus size — so a
    // broadcast semi leaves the accumulated posting table entirely
    // unshuffled: the one full-table touch per micro-batch is a scan
    val batchSg = batchPostings.select("sg").distinct()
    postings.join(broadcast(batchSg), Seq("sg"), "left_semi")
  }

  /** PRECONDITION (both posting inputs): rows are DISTINCT per
    * `(doc_id, sg)` — [[withShingles]] guarantees it via
    * `array_distinct` and a 64-bit shingle hash. The intersection count
    * below replaces `countDistinct` with `count(1)` plus a batch-batch
    * halving fix-up, which is exact ONLY under that invariant: a
    * caller-supplied `batchPostings` with duplicate `(doc_id, sg)` rows
    * (or an intra-doc xxhash64 collision, ~n_shingles²/2⁶⁵ per doc)
    * would over-count, and odd counts truncate on the /2 cast where
    * `countDistinct` was robust. New posting sources must dedup first.
    */
  def jaccardBatchProbeFromHits(batchPostings: DataFrame, hits: DataFrame,
      threshold: Double, maxDf: Long = DefaultMaxDf): DataFrame = {
    // global df for the batch's shingles: counted over ALL posting rows
    // carrying them — identical to the full-table dfreq restricted here
    val dfreq = hits.groupBy("sg").agg(count(lit(1)).as("df"))
    val rare = dfreq.filter(col("df") <= maxDf && col("df") >= 2).select("sg")
    // rare is a SUBSET of the batch's shingles (dfreq groups hits by sg),
    // so it is batch-bounded too — broadcast keeps hits/batch unshuffled
    val ex = hits.join(broadcast(rare), Seq("sg"), "left_semi")
    val exBatch = batchPostings.join(broadcast(rare), Seq("sg"), "left_semi")
    // Postings are distinct per doc (array_distinct shingles) and a doc
    // arrives in exactly one batch, so each (pair, shingle) hit appears
    // ONCE from the asymmetric join — except batch-batch pairs, hit from
    // both orientations. A map-side count(1) with a pair-sized broadcast
    // halving fix-up replaces countDistinct: the exchange then carries
    // partially-aggregated (da,db) rows, not every distinct (da,db,sg)
    // combination.
    val batchDocs = batchPostings.select(col("doc_id")).distinct()
    // sizes ride the rows: whichever side is the smaller doc_id supplies
    // na (constant per doc, so max() just picks the carried value)
    ex.as("a").join(exBatch.as("b"),
        col("a.sg") === col("b.sg") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(least(col("a.doc_id"), col("b.doc_id")).as("da"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
      .agg(count(lit(1)).as("cnt"),
        max(when(col("a.doc_id") < col("b.doc_id"), col("a.n_sh"))
          .otherwise(col("b.n_sh"))).as("na"),
        max(when(col("a.doc_id") < col("b.doc_id"), col("b.n_sh"))
          .otherwise(col("a.n_sh"))).as("nb"))
      .join(broadcast(batchDocs.select(col("doc_id").as("da"),
        lit(true).as("da_b"))), Seq("da"), "left")
      .join(broadcast(batchDocs.select(col("doc_id").as("db"),
        lit(true).as("db_b"))), Seq("db"), "left")
      .withColumn("inter", when(col("da_b") && col("db_b"),
        col("cnt") / 2).otherwise(col("cnt")).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** MinHash signatures: `perms` permutations over shingles
    * (shingle -> minhash -> band -> bucket join), via the native
    * [[graft.functions.TextHash.minhashSig]] kernel — two string hashes
    * per shingle plus a tight h1+i*h2 loop (Kirsch–Mitzenmacher
    * composite hashing), versus `perms` interpreted hash-expression
    * evaluations per shingle. Minwise independence for the banding
    * analysis is gated by recall in DedupSpec.
    */
  def minhashSignatures(sh: DataFrame, perms: Int): DataFrame =
    sh.filter(size(col("shingles")) > 0).select(col("doc_id"),
      graft.functions.TextHash.minhashSig(col("shingles"), perms).as("sig"))

  /** Per-bucket candidate cap for the pair-LISTING forms: a bucket of m
    * colliding documents emits m(m-1)/2 pairs — a single pathological
    * near-dup cluster (every page of a mirrored site, a boilerplate
    * template) makes the OUTPUT itself unmaterializable at corpus scale,
    * which no plan shape can fix. Past the cap a bucket degrades
    * gracefully: all-pairs among its `maxBucket` smallest doc_ids, STAR
    * edges (bucket-min, member) for the overflow — output is
    * O(cap² + m) CANDIDATE rows per bucket. Every colliding document
    * keeps ≥ 1 candidate edge, but the star anchor is the bucket MIN:
    * an overflow member whose true Jaccard clears the threshold against
    * some capped member yet not against the min loses its pairs at the
    * verify step. In practice the 16 bands each contribute an
    * independent bucket-min anchor, and for the pathological case the
    * cap exists for (a giant near-IDENTICAL cluster) min-anchored
    * verification succeeds — DedupSpec gates bound, coverage,
    * connectivity and precision on exactly that case. Same guard shape
    * as the reference's SPANN posting-size caps
    * (`rust/index/src/spann/types.rs`). Pass `Int.MaxValue` for the
    * exhaustive listing (the `*_oracle` proof twins do).
    */
  val DefaultMaxBucket = 256

  /** LSH candidate pairs -> exact-Jaccard verification at `threshold`.
    * Returns verified pairs (subset of [[jaccardPairs]] output, with recall
    * 1-(1-j^r)^b per pair). The PUBLIC default is the [[DefaultMaxBucket]]
    * cap — one adversarial bucket must degrade to capped pairs + star
    * edges (bounded output, cluster still covered and connected — gated
    * in DedupSpec), never O(|bucket|²) candidate rows blowing up an
    * executor. Exhaustive proof paths (the `*_oracle` twins) opt into
    * `maxBucket = Int.MaxValue` explicitly. For a CLUSTER answer at scale
    * prefer [[minhashLshClusters]] — output-proportional with no cap at
    * all.
    */
  def minhashLsh(docs: DataFrame, threshold: Double, n: Int = 3,
      bands: Int = 16, rows: Int = 4,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // Cache the SIGNATURES (doc_id + 64 longs — megabytes), not the
    // array<string> shingle table: the banding select references sig 16
    // times and the candidate self-join twice more, while the shingle
    // arrays are only re-read by the final verify joins (two cheap
    // re-scans of the codegen'd tokenize).
    val sh = withShingles(docs, n)
    val sig = graft.sources.CollectionStore.cacheOnce(
      minhashSignatures(sh, bands * rows))
    lshVerify(bucketCandidates(bandRowsOf(sig, bands, rows), maxBucket),
      sh, threshold)
  }

  /** Banded bucket rows `(doc_id, band, bkey)` from a signature table —
    * each band's `rows`-wide signature slice hashes to one bucket key.
    */
  private def bandRowsOf(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(col("doc_id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows))): _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))

  /** The MinHash index's SERVING layout — per-document banded bucket rows
    * `(doc_id, band, bkey)`. Signature and banding are per-document
    * independent, so a table built by appending per-batch outputs of this
    * function is ROW-IDENTICAL to one batch build over the union — the
    * property the streaming maintenance face
    * ([[graft.streaming.EventStream.minhashMaintain]]) relies on, same
    * contract as IVF assignment and quantized code rows.
    */
  def bandedRows(docs: DataFrame, n: Int = 3, bands: Int = 16,
      rows: Int = 4): DataFrame =
    bandRowsOf(minhashSignatures(withShingles(docs, n), bands * rows),
      bands, rows)

  /** Persist the LSH build parameters beside a banded bucket table as
    * `_lsh_params.json` (the `_` prefix keeps parquet readers away). A
    * probe recomputes the batch's banded rows with its OWN (n, bands,
    * rows) and joins them against the table — a parameter mismatch loses
    * every candidate silently, so the maintainers write this sidecar and
    * [[minhashLshProbe]] cross-checks what the table itself reveals.
    */
  def writeLshParams(dir: String, n: Int, bands: Int, rows: Int): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("_lsh_params.json"),
      s"""{"n": $n, "bands": $bands, "rows": $rows}""".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Read back [[writeLshParams]]'s sidecar: `Some((n, bands, rows))`
    * when present.
    */
  def readLshParams(dir: String): Option[(Int, Int, Int)] = {
    val f = java.nio.file.Paths.get(dir, "_lsh_params.json")
    if (!java.nio.file.Files.isRegularFile(f)) None
    else {
      val s = new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8)
      def field(k: String) =
        s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toInt)
      for (n <- field("n"); b <- field("bands"); r <- field("rows"))
        yield (n, b, r)
    }
  }

  /** Candidate pairs from (band, bucket-key) collisions in a banded
    * bucket table. `maxBucket < Int.MaxValue` bounds per-bucket emission
    * (see [[DefaultMaxBucket]]): all-pairs among each bucket's
    * `maxBucket` smallest doc_ids, star edges to the bucket min for the
    * rest — O(cap² + m) candidate rows per bucket instead of O(m²),
    * every member still on ≥ 1 edge. The rank window shuffles on the
    * same (band, bkey) key the self-join needs, so the cap costs one
    * per-bucket sort, no extra exchange pattern.
    */
  private def bucketCandidates(banded: DataFrame,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")
    if (maxBucket == Int.MaxValue) {
      val a = banded.as("a"); val b = banded.as("b")
      a.join(b,
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
    } else {
      val w = Window.partitionBy(col("band"), col("bkey"))
        .orderBy(col("doc_id"))
      val ranked = banded.withColumn("rk", row_number().over(w))
      val head = ranked.filter(col("rk") <= maxBucket)
      val pairs = head.as("a").join(head.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      // overflow members keep exactly one candidate edge to the bucket
      // min (rk = 1, so da < db holds by construction)
      val bmin = head.filter(col("rk") === 1)
        .select(col("band"), col("bkey"), col("doc_id").as("da"))
      val overflow = ranked.filter(col("rk") > maxBucket)
        .join(bmin, Seq("band", "bkey"))
        .select(col("da"), col("doc_id").as("db"))
      pairs.union(overflow).distinct()
    }
  }

  /** Exact-Jaccard verification of candidate pairs against the corpus's
    * shingle sets — LSH precision is exact because every emitted pair
    * re-checks true Jaccard here.
    */
  private def lshVerify(candidates: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame =
    candidates
      .join(sh.select(col("doc_id").as("da"), col("shingles").as("sa")), "da")
      .join(sh.select(col("doc_id").as("db"), col("shingles").as("sb")), "db")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))

  /** Star-shaped candidate edges from a banded bucket table: each
    * (band, bkey) bucket emits `(bucket min doc_id, member)` edges —
    * O(|bucket|) rows where the all-pairs form emits O(|bucket|²). One
    * window shuffle on the bucket key, NO self-join. For cluster
    * labeling this is the output-proportional 100 TB path: a cluster of
    * m duplicates costs m label rows, never m²/2 pair rows; the star
    * keeps every bucket connected, and the 16 bands give 16 independent
    * bucket-min anchors per near-dup group, so a single anchor failing
    * the Jaccard verify rarely disconnects anything (DedupSpec gates
    * the cluster recall).
    */
  def bucketStarEdges(banded: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("band"), col("bkey"))
    banded.withColumn("bmin", min(col("doc_id")).over(w))
      .filter(col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("da"), col("doc_id").as("db"))
      .distinct()
  }

  /** Near-dup CLUSTER LABELS straight from the banded buckets — the
    * output-proportional form of LSH dedup (the scale path where
    * [[minhashLsh]]'s full pair list is inherently quadratic in cluster
    * size): candidates are per-bucket STAR edges ([[bucketStarEdges]]),
    * each verified against true Jaccard, then connected components label
    * every document with its component minimum (singletons
    * self-cluster). `exhaustive = true` switches candidate generation to
    * the all-pairs bucket join — at threshold 1.0 that end is PROVABLY
    * exact (equal shingle sets collide in every band and set equality is
    * transitive, so components are exactly the equal-set groups), which
    * is what the hash-exact `dd_minhash_clusters_oracle` twin pins.
    */
  def minhashLshClusters(docs: DataFrame, threshold: Double, n: Int = 3,
      bands: Int = 16, rows: Int = 4, exhaustive: Boolean = false,
      maxIters: Int = 25): DataFrame = {
    val sh = withShingles(docs, n)
    val sig = graft.sources.CollectionStore.cacheOnce(
      minhashSignatures(sh, bands * rows))
    val banded = bandRowsOf(sig, bands, rows)
    val cand = if (exhaustive) bucketCandidates(banded)
               else bucketStarEdges(banded)
    val verified = lshVerify(cand, sh, threshold).select(col("da"), col("db"))
    val labels = connectedComponents(verified, maxIters)
      .withColumnRenamed("node", "doc_id")
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster"))
  }

  /** LSH near-dup pairs served from a PERSISTED banded bucket table
    * (stream-appended or batch-built): candidates come from (band, bkey)
    * collisions in the table — partition-pruned to the bands, never
    * re-hashing the corpus — and verification re-checks exact Jaccard
    * against the documents. Semantically identical to [[minhashLsh]]
    * whenever `banded` holds [[bandedRows]] of the same corpus.
    */
  def minhashLshServed(docs: DataFrame, banded: DataFrame,
      threshold: Double, n: Int = 3,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    lshVerify(bucketCandidates(banded, maxBucket), withShingles(docs, n),
      threshold)

  /** Ingest-time near-dup PROBE: pairs touching a NEW batch only. The
    * batch's banded rows join the persisted bucket table — cost scales
    * with |batch| × collisions, never corpus² — so the per-ingest
    * question "which arriving documents near-duplicate anything already
    * stored (or each other)?" runs on the ingest cadence at 100 TB
    * without re-pairing the corpus. `docs` must cover both sides'
    * texts for the exact-Jaccard verify (the corpus including the
    * batch); `banded` is the maintained table including the batch's
    * rows ([[graft.streaming.EventStream.minhashMaintain]] appends
    * them). Output pairs are exactly [[minhashLshServed]]'s restricted
    * to those with at least one side in the batch (same collision
    * criterion, probe-side narrowed) — DedupSpec gates the equality.
    */
  def minhashLshProbe(batch: DataFrame, docs: DataFrame, banded: DataFrame,
      threshold: Double, n: Int = 3, bands: Int = 16,
      rows: Int = 4, validate: Boolean = true): DataFrame = {
    // a table built with different (bands, rows, n) would join to zero
    // candidates SILENTLY — fail loudly on the one mismatch the table
    // itself reveals (band count). The check is a full Spark action over
    // `banded`'s lineage, so it is OPT-OUT (`validate = false`) for hot
    // ingest paths that probe repeatedly against an uncached DataFrame;
    // the SERVED form ([[minhashLshProbeServed]]) is the right call on
    // serving paths — it validates all three parameters from the
    // `_lsh_params.json` sidecar at metadata cost instead.
    if (validate) {
      val tblMaxBand = banded.agg(max(col("band"))).head()
      require(tblMaxBand.isNullAt(0) || tblMaxBand.getInt(0) == bands - 1,
        s"minhashLshProbe: probe uses $bands bands but the banded table's " +
          s"max band is ${tblMaxBand.get(0)} — probe and table must be " +
          "built with identical (bands, rows, n); see _lsh_params.json")
    }
    probeVerified(batch, docs, banded, threshold, n, bands, rows)
  }

  /** [[minhashLshProbe]] over a PERSISTED banded table directory — the
    * serving form the ingest cadence should call: build parameters
    * validate against the `_lsh_params.json` sidecar the maintainers
    * persist ([[writeLshParams]]) at METADATA cost, covering all three
    * of (n, bands, rows) where the DataFrame variant can only scan for
    * the band count. Absent a sidecar (a pre-r8 table) it falls back to
    * the scan check.
    */
  def minhashLshProbeServed(batch: DataFrame, docs: DataFrame,
      bandedDir: String, threshold: Double, n: Int = 3, bands: Int = 16,
      rows: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val banded = spark.read.parquet(bandedDir).select("doc_id", "band", "bkey")
    readLshParams(bandedDir) match {
      case Some((tn, tb, tr)) =>
        require(tn == n && tb == bands && tr == rows,
          s"minhashLshProbeServed: table $bandedDir was built with " +
            s"(n=$tn, bands=$tb, rows=$tr) but the probe uses " +
            s"(n=$n, bands=$bands, rows=$rows) — a mismatch would lose " +
            "every candidate silently")
        probeVerified(batch, docs, banded, threshold, n, bands, rows)
      case None =>
        minhashLshProbe(batch, docs, banded, threshold, n, bands, rows)
    }
  }

  private def probeVerified(batch: DataFrame, docs: DataFrame,
      banded: DataFrame, threshold: Double, n: Int, bands: Int,
      rows: Int): DataFrame = {
    val probe = bandedRows(batch, n, bands, rows)
    val candidates = banded.as("a")
      .join(probe.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
      .distinct()
    lshVerify(candidates, withShingles(docs, n), threshold)
  }

  /** The per-ingest CLEANING pipeline over an arriving batch, composed
    * from the ingest-time dedup faces — what a training-data pipeline
    * actually runs on each WAL batch at 100 TB:
    *
    *   1. exact-dup cut: a batch document drops if its text digest
    *      already exists in the corpus, or earlier (smaller doc_id)
    *      within the batch — digest anti-join, batch-sized;
    *   2. span dedup with CORPUS PRIORITY: surviving documents cut every
    *      `span`-word segment present anywhere in the stored corpus or
    *      earlier within the batch, then rebuild ([[segmentRows]] /
    *      [[spanReconstruct]] — the stored side would be the maintained
    *      seen-segments table of
    *      [[graft.streaming.EventStream.spanDedupMaintain]]);
    *   3. quality floor: documents whose surviving text falls under
    *      `minWords` words (Gopher-style minimum length over what
    *      REMAINS, not the raw input) drop entirely.
    *
    * Every step is exact — the whole pipeline is oracle-checkable.
    * Scale: two segment-value shuffles (batch segs ⋈ corpus segs,
    * hash-partitioned on the value) and one digest anti-join; the
    * corpus side streams through as build input, never re-pairs.
    */
  def ingestClean(batch: DataFrame, corpus: DataFrame, span: Int = 8,
      minWords: Int = 24): DataFrame = {
    // keep-min per digest as an aggregate, not a window — the same
    // skew-safe shape as [[markFirstSegments]] (doc_id is unique, so
    // min(struct(doc_id, text)) picks exactly the smallest-id copy)
    val uniq = batch.select(md5(col("text")).as("digest"),
        struct(col("doc_id"), col("text")).as("r"))
      .groupBy("digest").agg(min(col("r")).as("r"))
      .join(corpus.select(md5(col("text")).as("digest")).distinct(),
        Seq("digest"), "left_anti")
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
    val corpusSegs = segmentRows(corpus, span).select("seg").distinct()
    val marked = markFirstSegments(segmentRows(uniq, span))
      .withColumnRenamed("is_first", "first_in_batch")
      .join(corpusSegs.withColumn("in_corpus", lit(true)), Seq("seg"), "left")
      .withColumn("is_first", col("first_in_batch") && col("in_corpus").isNull)
    spanReconstruct(marked.select("doc_id", "seg_idx", "seg", "is_first"))
      .filter(col("n_kept") > 0 &&
        size(split(col("kept_text"), " ")) >= minWords)
  }

  /** 64-bit SimHash over tokens: per-bit vote of seeded token hashes,
    * via the native [[graft.functions.TextHash.simhash64]] kernel (one
    * JVM loop per row instead of a 64-wide interpreted fold per token).
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextHash.simhash64(TextStats.tokens(col("text"))).as("simhash"))

  /** 4×16-bit banded rows `(doc_id, simhash, band, chunk)` of a
    * signature table — the SimHash index's serving layout, per-document
    * independent (appendable per batch, same contract as
    * [[bandedRows]]).
    */
  def simhashBandRows(docs: DataFrame): DataFrame =
    simhash(docs).select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .select(col("doc_id"), col("simhash"),
        col("pos").as("band"), col("col").as("chunk"))

  /** Hamming-distance pairs <= maxDist via 4x16-bit banded candidates. */
  def simhashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    val sig = graft.sources.CollectionStore.cacheOnce(simhash(docs))
    val banded = sig.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .select(col("doc_id"), col("simhash"), col("pos").as("band"), col("col").as("chunk"))
    val a = banded.as("a"); val b = banded.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("a.simhash").as("ha"),
        col("b.doc_id").as("db"), col("b.simhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("da"), col("db"), col("hamming"))
  }

  /** Ingest-time SimHash probe — [[minhashLshProbe]]'s Hamming twin:
    * the arriving batch's banded signature rows join a maintained
    * banded table (batch- or stream-built [[simhashBandRows]]) on
    * (band, chunk); collisions verify exact Hamming distance. Output
    * pairs are exactly [[simhashPairs]]'s restricted to those touching
    * the batch (same collision criterion, probe-side narrowed —
    * DedupSpec gates it).
    */
  def simhashProbePairs(batch: DataFrame, banded: DataFrame,
      maxDist: Int): DataFrame = {
    val probe = simhashBandRows(batch)
    val cand = banded.as("a").join(probe.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("db"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("da"), col("db"), col("hamming"))
      .distinct()
  }

  /** Connected components over the near-duplicate pair graph — the
    * cluster-then-keep-one step of corpus dedup (each cluster's min
    * doc_id is the canonical survivor). Min-label propagation: every
    * paired doc starts as its own label; each iteration takes the min of
    * neighbor labels (one shuffle join), converging in graph-diameter
    * iterations — near-dup clusters are near-cliques, so 2-4 rounds in
    * practice, with `maxIters` bounding adversarial chains. Lineage is
    * truncated per iteration via localCheckpoint; on a real cluster use
    * a reliable checkpoint dir. Only docs appearing in >= 1 pair are
    * clustered (singletons are trivially their own canonical).
    */
  def dupClusters(docs: DataFrame, threshold: Double, n: Int = 3,
      maxIters: Int = 25): DataFrame = {
    val pairs = jaccardPairs(docs, threshold, n).select(col("da"), col("db"))
    val labels = connectedComponents(pairs, maxIters)
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("csize"))
    labels.join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster"), col("csize"))
  }

  /** Incremental cluster maintenance — attach an arriving batch to the
    * EXISTING near-dup clusters from batch-touching pairs alone (the
    * probe output: [[minhashLshProbe]] / a batch-restricted
    * [[jaccardPairs]]), never re-clustering the corpus. Corpus endpoints
    * enter the component solve as their stored cluster LABEL (the
    * cluster minimum), so a component's resolved minimum is exactly the
    * full fixpoint's label for every batch document — restricted to the
    * batch, incremental attach EQUALS a corpus-wide re-cluster, with no
    * ordering assumption on ids (DedupSpec gates it): the only edges a
    * batch adds are batch-touching, so any pre-existing corpus cluster
    * reachable from the batch contributes its whole membership through
    * its label.
    *
    * Output: `(doc_id, cluster, merged_from)` for every batch document —
    * singletons self-cluster, `merged_from` lists every stored corpus
    * label superseded by the component's resolved minimum: the ≥2-label
    * fusion case AND the single-cluster relabel (a batch doc with a
    * smaller id joining exactly one existing cluster retires that
    * cluster's old label too — the full fixpoint would relabel its
    * members; emitting the retirement set and relabeling on the
    * compaction cadence is the attach-now/fix-later split of streaming
    * index maintenance).
    */
  def assignToClusters(batch: DataFrame, pairs: DataFrame,
      labels: DataFrame, maxIters: Int = 25): DataFrame = {
    val lab = labels.select(col("doc_id").as("n"), col("cluster").as("l"))
    def anchored(side: String): Column = coalesce(col("l"), col(side))
    val e0 = pairs.select(col("da"), col("db"))
      .join(lab.withColumnRenamed("n", "da"), Seq("da"), "left")
      .withColumn("ea", anchored("da")).drop("l")
      .join(lab.withColumnRenamed("n", "db"), Seq("db"), "left")
      .withColumn("eb", anchored("db")).drop("l")
    val comp = connectedComponents(
      e0.select(col("ea"), col("eb")), maxIters)
    // a batch doc resolves through its own (possibly anchored) node id;
    // corpus-anchored batch docs are not in `comp` under their raw id,
    // so re-join through the anchor node
    val batchNodes = batch.select(col("doc_id"))
      .join(lab.withColumnRenamed("n", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("l"), col("doc_id")).as("node"))
    val assigned = batchNodes
      .join(comp, Seq("node"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("node")).as("cluster"))
    // retired labels: distinct corpus labels whose component resolved to
    // a smaller label — attach them to every batch doc in that component
    val retired = comp.join(lab.select(col("l").as("node")).distinct(), "node")
      .filter(col("node") =!= col("label"))
      .groupBy("label").agg(sort_array(collect_set(col("node"))).as("mf"))
    assigned.join(retired.withColumnRenamed("label", "cluster"),
        Seq("cluster"), "left")
      .select(col("doc_id"), col("cluster"),
        coalesce(col("mf"), array().cast("array<long>")).as("merged_from"))
  }

  /** One step of INCREMENTAL cluster maintenance: fold a batch's
    * touching pairs into the persisted label table, returning the
    * UPDATED table — the mutation twin of the read-only
    * [[assignToClusters]]. Three label movements per step, each a plain
    * DataFrame op:
    *
    *   1. components solve over the batch-induced graph with corpus
    *      endpoints anchored as their stored label (exactly
    *      [[assignToClusters]]'s solve);
    *   2. every raw endpoint of this batch's pairs — batch docs AND
    *      corpus docs, paired before or not — lands on its component's
    *      resolved label (storing only batch docs would strand a
    *      previously-unpaired corpus doc on its raw id and mis-anchor
    *      the NEXT batch);
    *   3. stored rows whose cluster label was retired by a merge
    *      relabel to the surviving minimum (the attach-now/fix-later
    *      retirement applied immediately — table-sized, not
    *      corpus-sized).
    *
    * Applied batch-by-batch this reproduces the corpus-wide fixpoint
    * exactly (StreamingSpec gates the multi-batch equality): components
    * only ever grow, labels are component minima, and every edge the
    * full solve sees is folded by the step that introduced it.
    */
  def foldClusterStep(pairs: DataFrame, labels: DataFrame,
      maxIters: Int = 25): DataFrame = {
    val lab0 = labels.select(col("doc_id"), col("cluster").as("l"))
    val lab = lab0.select(col("doc_id").as("n"), col("l"))
    val e0 = pairs.select(col("da"), col("db"))
      .join(lab.withColumnRenamed("n", "da"), Seq("da"), "left")
      .withColumn("ea", coalesce(col("l"), col("da"))).drop("l")
      .join(lab.withColumnRenamed("n", "db"), Seq("db"), "left")
      .withColumn("eb", coalesce(col("l"), col("db"))).drop("l")
    val comp = connectedComponents(
        e0.select(col("ea"), col("eb")), maxIters)
      .select(col("node"), col("label"))
    // every raw endpoint resolves through its anchor node
    val endpoints = pairs.select(explode(array(col("da"), col("db"))).as("doc_id"))
      .distinct()
      .join(lab.withColumnRenamed("n", "doc_id"), Seq("doc_id"), "left")
      .withColumn("node", coalesce(col("l"), col("doc_id"))).drop("l")
      .join(comp, Seq("node"))
      .select(col("doc_id"), col("label").as("cluster"))
    // stored rows whose label moved relabel to the surviving minimum
    val moved = comp.filter(col("node") =!= col("label"))
      .select(col("node").as("old_l"), col("label").as("new_l"))
    val untouched = lab0.join(
      endpoints.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val relabeled = untouched
      .join(moved.withColumnRenamed("old_l", "l"), Seq("l"), "left")
      .select(col("doc_id"), coalesce(col("new_l"), col("l")).as("cluster"))
    relabeled.unionByName(endpoints)
  }

  /** Pair-count bound under which [[connectedComponents]] solves the
    * fixpoint driver-side. Sized for REAL JVM overhead, not raw bytes: a
    * collected Row with two boxed longs is ~100 B and the union-find map
    * adds ~50 B per node, so the cap costs ~150-250 MB of driver heap —
    * safe on any practically-sized driver, same envelope as the FTS
    * driver intersect (`Fts.scala`). Above it the distributed
    * propagation runs (the probe's bounded collect is then wasted work,
    * accepted: one early-terminating pass against saving
    * diameter-many shuffle jobs in the common sparse case).
    */
  val DriverCcMaxPairs: Int = 1000000

  /** Connected components over an undirected pair graph `(da, db)` →
    * `(node, label)` where `label` is the component's min node id. Only
    * paired nodes appear.
    *
    * Size-adaptive: a dedup pair graph is sparse (|pairs| << |docs| —
    * pairs only exist between near-duplicates), so when it fits the
    * bounded driver buffer a single collect + union-find replaces
    * diameter-many shuffle rounds (each a full Spark job): one action
    * total instead of 3-4 per iteration. Past [[DriverCcMaxPairs]] the
    * min-label propagation below handles arbitrary scale — one shuffle
    * join per iteration, lineage truncated per round via localCheckpoint
    * (a reliable checkpoint dir on a real cluster).
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 25,
      driverMaxPairs: Int = DriverCcMaxPairs): DataFrame = {
    val p = pairs.toDF("da", "db")
    val probe = p.limit(driverMaxPairs + 1).collect()
    if (probe.length <= driverMaxPairs) {
      // union-find, larger root linked beneath smaller: every node enters
      // as its own root, so a component's final root IS its min node id
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrDefault(x, x)
        while (p != x) { // path halving
          val gp = parent.getOrDefault(p, p)
          parent.put(x, gp)
          x = gp
          p = parent.getOrDefault(x, x)
        }
        x
      }
      probe.foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val nodes = scala.collection.mutable.LongMap[Unit]()
      probe.foreach { r =>
        nodes.update(r.getLong(0), ()); nodes.update(r.getLong(1), ())
      }
      val spark = pairs.sparkSession
      import spark.implicits._
      return spark.createDataset(
        nodes.keys.map(n => (n, find(n))).toSeq).toDF("node", "label")
    }
    distributedComponents(p, maxIters)
  }

  /** The distributed fixpoint leg of [[connectedComponents]]: min-label
    * propagation, one shuffle join per iteration, converging in
    * graph-diameter rounds (near-dup clusters are near-cliques, so 2-4
    * rounds in practice, with `maxIters` bounding adversarial chains).
    */
  private[graft] def distributedComponents(pairs: DataFrame,
      maxIters: Int): DataFrame = {
    val p = pairs.toDF("da", "db")
    val edges = p.union(p.select(col("db"), col("da")))
      .toDF("src", "dst").localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var it = 0
    var done = false
    while (!done && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("node")).agg(min(col("label")).as("nbl"))
      // every node has >= 1 edge (both directions present) so the inner
      // join keeps the full node set. The improvement flag rides along in
      // the checkpointed result, so convergence detection reads the
      // materialized iteration instead of running another join.
      val next = labels.join(nbrMin, Seq("node"))
        .select(col("node"), least(col("label"), col("nbl")).as("label"),
          (col("nbl") < col("label")).as("improved"))
        .localCheckpoint(true)
      done = next.filter(col("improved")).isEmpty
      labels = next.select("node", "label")
      it += 1
    }
    if (!done)
      org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup").warn(
        s"connectedComponents: not converged after $maxIters rounds — " +
          "labels for components with diameter past the bound are split; " +
          "raise maxIters for chain-shaped graphs")
    labels
  }

  /** Embedding cosine-threshold pairs from IVF posting co-membership —
    * the candidate generator for [[semanticDedup]]. Same Σ|list|² bucketed
    * shape as [[embeddingAnnPairs]], but threshold-filtered instead of
    * global top-k (a fixpoint input, not a ranking).
    */
  def embeddingThresholdPairs(model: Ivf.Model, threshold: Double): DataFrame = {
    val p = model.postings.select(col("centroid_id"), col("offset_id"), col("embedding"))
    val a = p.as("a"); val b = p.as("b")
    a.join(b, col("a.centroid_id") === col("b.centroid_id") &&
        col("a.offset_id") < col("b.offset_id"))
      .select(col("a.offset_id").as("va"), col("b.offset_id").as("vb"),
        Distances.cosineSimilarity(col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
      .dropDuplicates("va", "vb")
  }

  /** Ingest-time embedding near-dup PROBE — [[minhashLshProbe]]'s dense
    * twin: an arriving vector batch assigns to its nReplica nearest
    * centroids (the same deterministic map that built the maintained
    * posting table, so probe rows reproduce exactly the batch's posting
    * rows) and joins ONLY those centroids' posting lists for exact-cosine
    * verification — |batch| × Σ|probed list| work, never corpus². Output:
    * pairs touching the batch with sim >= threshold, exactly
    * [[embeddingThresholdPairs]] restricted to batch-touching pairs
    * (DedupSpec gates the equality).
    */
  def embeddingProbePairs(batch: DataFrame, model: Ivf.Model,
      threshold: Double, nReplica: Int = 2): DataFrame = {
    val probe = Ivf.assign(batch, model.centroids, nReplica)
    val p = model.postings
      .select(col("centroid_id"), col("offset_id"), col("embedding"))
    p.as("a").join(probe.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.offset_id") =!= col("b.offset_id"))
      .select(least(col("a.offset_id"), col("b.offset_id")).as("va"),
        greatest(col("a.offset_id"), col("b.offset_id")).as("vb"),
        Distances.cosineSimilarity(col("a.embedding"), col("b.embedding"))
          .as("sim"))
      .filter(col("sim") >= threshold)
      .dropDuplicates("va", "vb")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * connected components over the cosine-threshold near-dup graph, keep
    * one representative (min id) per component. Candidate pairs come from
    * IVF posting co-membership — the published method's "dedup within
    * k-means clusters" step, here riding the SAME persisted serving index
    * as the ANN queries — so the all-pairs cosine never materializes.
    * Output: every vector tagged `(vec_id, keep_id, is_dup)`; singletons
    * keep themselves. Approximate (cluster-boundary pairs can be missed);
    * recall vs the exact threshold graph is gated in DedupSpec.
    */
  def semanticDedup(vecs: DataFrame, model: Ivf.Model,
      threshold: Double, maxIters: Int = 25): DataFrame = {
    val pairs = embeddingThresholdPairs(model, threshold)
      .select(col("va"), col("vb"))
    val labels = connectedComponents(pairs, maxIters)
      .select(col("node").as("vec_id"), col("label"))
    vecs.select(col("vec_id"))
      .join(labels, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("keep_id"))
      .withColumn("is_dup", col("vec_id") =!= col("keep_id"))
  }

  /** Exact top-k most-similar embedding pairs (cosine) — all-pairs
    * cartesian, O(n²) distance evals. Kept ONLY as the oracle/spec
    * baseline; the scale path is [[embeddingAnnPairs]].
    */
  def embeddingTopPairs(vecs: DataFrame, k: Int): DataFrame = {
    val a = vecs.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = vecs.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"),
        Distances.cosineSimilarity(col("ea"), col("eb")).as("sim"))
      .orderBy(col("sim").desc, col("va"), col("vb"))
      .limit(k)
  }

  /** Approximate top-k near-duplicate pairs via IVF posting co-membership
    * — the bucketed 100 TB path (SPANN posting-list locality,
    * `rust/index/src/spann/types.rs`): candidate pairs are generated ONLY
    * inside each centroid's posting list (a shuffle-colocated self-join on
    * `centroid_id`, Σ|list|² work instead of n²), then verified with the
    * exact cosine kernel. `nReplica` multi-assignment is what catches
    * near-dups straddling a centroid boundary; recall vs the exact top-k
    * is gated in DedupSpec (>= 0.9).
    */
  def embeddingAnnPairs(model: Ivf.Model, k: Int): DataFrame = {
    val p = model.postings.select(col("centroid_id"), col("offset_id"), col("embedding"))
    val a = p.as("a"); val b = p.as("b")
    a.join(b, col("a.centroid_id") === col("b.centroid_id") &&
        col("a.offset_id") < col("b.offset_id"))
      .select(col("a.offset_id").as("va"), col("b.offset_id").as("vb"),
        Distances.cosineSimilarity(col("a.embedding"), col("b.embedding")).as("sim"))
      .dropDuplicates("va", "vb") // pairs sharing several lists appear once
      .orderBy(col("sim").desc, col("va"), col("vb"))
      .limit(k)
  }

  /** Leakage-safe train/validation split: near-duplicate documents must
    * never straddle the split (a val doc with a train near-twin leaks
    * the evaluation), so the split key is the document's near-dup
    * CLUSTER (connected components of the Jaccard pair graph;
    * singletons are their own cluster), not the document. Assignment is
    * a pure deterministic hash of the cluster id — md5's first two hex
    * chars give 256 uniform buckets, and the cut point is a plain
    * string compare, so the same expression is portable to the DuckDB
    * oracle verbatim. valBuckets/256 is the validation fraction.
    *
    * Scale: the cluster labels come from [[dupClusters]] (bucketed
    * candidates → verify → size-adaptive components); the assignment
    * itself adds one broadcast-sized join of the label table ONLY for
    * paired docs — unpaired docs (the overwhelming majority of a real
    * corpus) take the coalesce path with zero extra movement.
    */
  def leakageSafeSplit(docs: DataFrame, threshold: Double = 0.5,
      valBuckets: Int = 26): DataFrame = {
    val labels = dupClusters(docs, threshold)
      .select(col("doc_id"), col("cluster"))
    val cut = f"$valBuckets%02x"
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("split",
        when(substring(md5(col("cluster").cast("string")), 1, 2) < cut,
          lit("val")).otherwise(lit("train")))
  }

  /** C4-style exact span dedup (the line-dedup of Raffel et al.'s C4
    * pipeline, arXiv:1910.10683 §2.2, over aligned spans — the corpus
    * has no newlines, so "lines" are consecutive `span`-word segments;
    * cf. the exact-substring dedup of Lee et al., arXiv:2107.06499):
    * every segment keeps only its FIRST corpus occurrence (smallest
    * (doc_id, seg_idx)); later occurrences — boilerplate, mirrored
    * chunks — are cut from their documents, and survivors rejoin in
    * order.
    *
    * Scale: two inherent shuffles — one on the segment value for the
    * first-occurrence window (the corpus moves once, AQE splits skewed
    * hot segments), one on doc_id for reconstruction. No driver state,
    * no iteration.
    */
  def spanDedup(docs: DataFrame, span: Int = 8): DataFrame =
    spanReconstruct(markFirstSegments(segmentRows(docs, span)))

  /** `(doc_id, seg_idx, seg)` — every document cut into consecutive
    * `span`-word segments (shared by the batch [[spanDedup]] and the
    * streaming face [[graft.streaming.EventStream.spanDedupMaintain]]).
    */
  def segmentRows(docs: DataFrame, span: Int = 8): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("wi", "word")))
      .withColumn("seg_idx", floor(col("wi") / span))
      .groupBy("doc_id", "seg_idx")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(wi, word))), x -> x.word)"),
        " ").as("seg"))

  /** Rebuild each document from its surviving segments, in order, with
    * kept/dropped counts. Input: segment rows carrying an `is_first`
    * keep flag.
    */
  def spanReconstruct(marked: DataFrame): DataFrame =
    marked.groupBy("doc_id").agg(
      array_join(expr(
        "transform(array_sort(collect_list(CASE WHEN is_first THEN struct(seg_idx, seg) END)), x -> x.seg)"),
        " ").as("kept_text"),
      sum(when(col("is_first"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(!col("is_first"), 1L).otherwise(0L)).as("n_dropped"))

  /** Exact repeated-SUBSTRING dedup (Lee et al., arXiv:2107.06499 —
    * "Deduplicating Training Data Makes Language Models Better"): every
    * SLIDING `k`-word window that occurs more than once in the corpus
    * keeps only its first occurrence (smallest (doc_id, start)); all
    * other occurrences' word positions are removed from their documents
    * and the survivors rejoin in order. Unlike [[spanDedup]]'s ALIGNED
    * segments (the C4 line rule), sliding windows catch duplicated
    * passages at ANY offset — the boilerplate that segment alignment
    * misses — at the cost of a k× window blowup.
    *
    * Output per document: (`doc_id`, `n_toks`, `n_removed`, `n_spans`,
    * `kept_text`) — `n_spans` counts the maximal contiguous removed
    * runs (merged overlapping duplicate windows).
    *
    * Scale (100 TB): the reference algorithm builds a corpus suffix
    * array; the distributed re-expression is this window-join — three
    * inherent keyed shuffles, no iteration, no driver state: (1) window
    * values shuffle for the first-occurrence window function (the k×
    * blowup moves once; AQE splits skewed hot windows — at extreme
    * scale, pre-shard by a window-hash prefix), (2) removed positions
    * shuffle on doc_id for span merging, (3) the word-level rebuild
    * shuffles on doc_id. Covered-position explode is bounded by
    * k × (duplicate windows), i.e. output-proportional.
    */
  /** [[substringDedup]]'s ingest-time face: cut an arriving batch
    * against the stored corpus without re-deduping the corpus. A batch
    * window's positions are removed iff the window occurs ANYWHERE in
    * the corpus (the stored side is immutable — its occurrences were
    * already served) or at an earlier (doc_id, start) within the batch
    * itself. Output: batch documents only, same shape as
    * [[substringDedup]] — row-identical to the corpus ∪ batch run
    * under corpus-first priority restricted to batch docs (the oracle
    * states exactly that).
    *
    * Scale: the within-batch first-occurrence window runs over |batch|
    * windows only; the corpus side contributes one left-semi join of
    * batch windows against the corpus window set — with a served
    * window table bucketed on the window value (the seen-table shape
    * of [[graft.streaming.EventStream.spanDedupMaintain]]) that join
    * co-locates, and nothing corpus-sized is ever windowed per probe.
    */
  def substringProbe(batch: DataFrame, corpus: DataFrame,
      k: Int = 10): DataFrame = {
    val bw = windowRows(batch, k)
    val inCorpus = bw.join(windowRows(corpus, k).select("win").distinct(),
        Seq("win"), "left_semi")
      .select(col("doc_id"), col("start"))
    substringReconstruct(batch,
      coveredPositions(inCorpus.union(laterOccurrences(bw)), k))
  }

  def substringDedup(docs: DataFrame, k: Int = 10): DataFrame = {
    val dup = laterOccurrences(windowRows(docs, k))
    substringReconstruct(docs, coveredPositions(dup, k))
  }

  /** Flag each window occurrence with `is_first` = it is its window
    * value's corpus-first (smallest (doc_id, start)).
    *
    * Deliberately an aggregate+join, not a `row_number` window: the
    * min-struct aggregate partial-combines map-side (one surviving row
    * per window value per partition BEFORE the shuffle) and the
    * re-join is AQE-skew-splittable, so a boilerplate window value with
    * millions of corpus occurrences costs a split join instead of
    * serializing one window-function task — a window over a hot key
    * cannot be skew-split. The firsts table keeps only DUPLICATED
    * values (a unique value is trivially its own first), so the join's
    * build side is duplicate-proportional — on a mostly-unique corpus
    * AQE broadcasts it and the mark costs ~one aggregation. Price: the
    * window explode evaluates twice (agg side is partial-combined,
    * join side is the full stream).
    */
  def markFirstWindows(wins: DataFrame): DataFrame =
    markFirst(wins, "win", "start")

  /** The removal set of [[substringDedup]]: every occurrence that is
    * not its window value's corpus-first.
    */
  private def laterOccurrences(wins: DataFrame): DataFrame =
    markFirstWindows(wins).filter(!col("is_first"))
      .select(col("doc_id"), col("start"))

  /** [[markFirstWindows]] for aligned segments: flag each segment row
    * with `is_first` = smallest (doc_id, seg_idx) for its value — the
    * same skew-safe aggregate+join shape.
    */
  def markFirstSegments(segs: DataFrame): DataFrame =
    markFirst(segs, "seg", "seg_idx")

  /** The shared shape behind [[markFirstWindows]]/[[markFirstSegments]]:
    * occurrences of `valueCol` flagged with `is_first` = smallest
    * (doc_id, `posCol`). See [[markFirstWindows]] for why this is an
    * aggregate+join and why the firsts table keeps only duplicated
    * values.
    */
  private def markFirst(occ: DataFrame, valueCol: String,
      posCol: String): DataFrame = {
    val pos = struct(col("doc_id"), col(posCol))
    occ.join(
        occ.groupBy(valueCol)
          .agg(min(pos).as("first"), count(lit(1)).as("n_occ"))
          .filter(col("n_occ") > 1) // unique values are trivially first
          .select(valueCol, "first"),
        Seq(valueCol), "left")
      .withColumn("is_first", col("first").isNull || pos === col("first"))
      .drop("first")
  }

  /** Sliding `k`-word windows of every document with >= k words:
    * (`doc_id`, `start`, `win`) with `start` 0-based and `win` the
    * space-joined window value — [[substringDedup]]'s unit of exactness,
    * built per row with an indexed `transform` (no positional
    * self-join; the k× blowup is the algorithm's inherent cost).
    */
  def windowRows(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("t")) - k),
        i => struct(i.as("start"),
          array_join(slice(col("t"), i + 1, lit(k)), " ").as("win")))).as("p"))
      .select(col("doc_id"), col("p.start").as("start"), col("p.win").as("win"))

  /** Expand removed window occurrences (`doc_id`, `start`) to their
    * distinct covered word positions (`doc_id`, `wi`) — bounded by
    * k × |removed windows|, i.e. output-proportional.
    */
  def coveredPositions(removed: DataFrame, k: Int): DataFrame =
    removed.select(col("doc_id"),
        explode(sequence(col("start"), col("start") + k - 1)).as("wi"))
      .distinct()

  /** Rebuild documents minus their covered positions, with removed-run
    * accounting: (`doc_id`, `n_toks`, `n_removed`, `n_spans`,
    * `kept_text`) — `n_spans` counts maximal contiguous removed runs.
    * Shared tail of [[substringDedup]], [[substringProbe]], and the
    * streaming maintainer.
    */
  def substringReconstruct(docs: DataFrame, covered: DataFrame): DataFrame = {
    // ONE pass over the joined word stream: word positions are
    // contiguous per doc, so a removed RUN starts exactly where a
    // covered position follows an uncovered (or absent) one — the
    // span accounting rides the same doc_id window the rebuild needs
    // anyway, and the expensive `covered` lineage is consumed once
    // instead of feeding a separate spans branch.
    val w = Window.partitionBy(col("doc_id")).orderBy(col("wi"))
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("wi", "word")))
      .join(covered.withColumn("cov", lit(true)), Seq("doc_id", "wi"), "left")
      .withColumn("span_start",
        col("cov").isNotNull &&
          !coalesce(lag(col("cov"), 1).over(w), lit(false)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("cov").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("span_start"), 1L).otherwise(0L)).as("n_spans"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN cov IS NULL THEN struct(wi, word) END)), x -> x.word)"),
          " ").as("kept_text"))
      .select(col("doc_id"), col("n_toks"), col("n_removed"),
        col("n_spans"), col("kept_text"))
  }

  /** Partitioned Bloom index over the corpus's content fingerprints —
    * the steady-state ingest dedup prefilter: the corpus passes ONCE
    * (skinny 8-byte fingerprints, one hash shuffle), folds into
    * `partitions` independent Bloom filters, and from then on an ingest
    * batch drops its certainly-new rows WITHOUT touching the corpus —
    * no join, no corpus-side shuffle, no false negatives (the Bloom
    * contract), so the surviving candidates exact-verify with a
    * batch-proportional join and the result is row-identical to the
    * plain exact probe.
    *
    * Partitioning is the scale knob: each filter is sized for its slice
    * (`~1.2 bytes/item` at the default 1% fpp), built in its own task
    * with bounded memory, and the set broadcasts as a pid-keyed map
    * that executors deserialize lazily — at 1B corpus items the
    * broadcast is ~1.2 GB across 16 slices. Past broadcast range
    * (>~10B items) the same build persists one filter per pid and the
    * probe repartitions the BATCH by pid so each task streams only its
    * own slice — the build is the expensive half either way, and it is
    * one corpus pass. Fingerprints are `xxhash64(text)` (deterministic,
    * seed-fixed), matching the exact-dup key up to 64-bit collisions
    * that the verify join removes.
    */
  final case class BloomIndex(partitions: Int,
      blooms: org.apache.spark.broadcast.Broadcast[Map[Int, Array[Byte]]])

  private def buildSlices(docs: DataFrame, partitions: Int,
      fpp: Double): (Map[Int, Array[Byte]], Long) = {
    val fps = docs.select(xxhash64(col("text")).as("fp")).distinct()
      .withColumn("pid", pmod(col("fp"), lit(partitions)).cast("int"))
      .repartition(partitions, col("pid"))
      .persist()
    // sizing needs the slice cardinality; one count over the cached
    // skinny frame, shared with the build pass. The 1.5x headroom is
    // the delta budget: stream-appended fingerprints ride the same
    // slices until a compaction-time rebuild resizes, the same
    // re-compaction contract as every served index family.
    val perSlice = math.max(1000L, fps.count() / partitions * 3 / 2)
    val parts = fps.select(col("pid"), col("fp"))
      .mapPartitions { it =>
        val local = scala.collection.mutable.Map[Int,
          org.apache.spark.util.sketch.BloomFilter]()
        it.foreach { r =>
          val b = local.getOrElseUpdate(r.getInt(0),
            org.apache.spark.util.sketch.BloomFilter.create(perSlice, fpp))
          b.putLong(r.getLong(1))
        }
        local.iterator.map { case (pid, b) =>
          val out = new java.io.ByteArrayOutputStream()
          b.writeTo(out)
          (pid, out.toByteArray)
        }
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.BINARY))
      .collect()
    fps.unpersist()
    // two tasks can only share a pid if the shuffle hashed two pids to
    // one slot AND a later stage split them — merge defensively (same
    // size + fpp ⇒ mergeable)
    val merged = parts.groupBy(_._1).map { case (pid, bs) =>
      val filters = bs.map(b => org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(b._2)))
      val head = filters.head
      filters.tail.foreach(head.mergeInPlace)
      val out = new java.io.ByteArrayOutputStream()
      head.writeTo(out)
      pid -> out.toByteArray
    }
    (merged, perSlice)
  }

  def buildBloomIndex(docs: DataFrame, partitions: Int = 16,
      fpp: Double = 0.01): BloomIndex = {
    val (merged, _) = buildSlices(docs, partitions, fpp)
    BloomIndex(partitions, docs.sparkSession.sparkContext.broadcast(merged))
  }

  /** Delta fingerprint rows for a doc micro-batch — what
    * [[graft.streaming.EventStream.bloomMaintain]] appends. Raw
    * `(pid, fp)` longs, NOT serialized filters: deltas stay tiny and
    * mergeable regardless of slice sizing, and re-applying one (replay,
    * crashed compaction) is idempotent because a Bloom put sets the
    * same bits it set the first time.
    */
  def bloomDeltaFps(batch: DataFrame, partitions: Int): DataFrame =
    batch.select(xxhash64(col("text")).as("fp")).distinct()
      .withColumn("pid", pmod(col("fp"), lit(partitions)).cast("int"))
      .select(col("pid"), col("fp"))

  private def bloomBaseDir(root: String) = s"$root/base"
  def bloomDeltasDir(root: String) = s"$root/deltas"
  private def bloomMetaPath(root: String) =
    java.nio.file.Paths.get(root, "_meta.json")

  /** Persist the corpus Bloom slices under `root` — the compaction-time
    * build the streaming deltas ride on. Layout:
    * {{{
    *   <root>/_meta.json       {partitions, fpp, per_slice}
    *   <root>/base             parquet (pid INT, bloom BINARY)
    *   <root>/deltas/batch=N   parquet (pid INT, fp LONG)  [streamed]
    * }}}
    */
  def saveBloomIndex(docs: DataFrame, root: String, partitions: Int = 16,
      fpp: Double = 0.01): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merged, perSlice) = buildSlices(docs, partitions, fpp)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    merged.toSeq.toDF("pid", "bloom").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(bloomBaseDir(root))
    java.nio.file.Files.write(bloomMetaPath(root),
      s"""{"partitions": $partitions, "fpp": $fpp, "per_slice": $perSlice}"""
        .getBytes("UTF-8"))
  }

  private[graft] def bloomMeta(root: String): (Int, Double, Long) = {
    val j = org.json4s.jackson.JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(bloomMetaPath(root)), "UTF-8"))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    ((j \ "partitions").extract[Int], (j \ "fpp").extract[Double],
      (j \ "per_slice").extract[Long])
  }

  private def bloomNextDir(root: String) = s"$root/base_next"
  // a compaction's folded base is valid iff its job committed
  private def committedNext(root: String): Boolean =
    new java.io.File(s"${bloomNextDir(root)}/_SUCCESS").exists()

  /** Load the persisted slices with every streamed delta folded in —
    * the serving read. Delta volume is bounded by write rate ×
    * compaction cadence (the WAL-tail contract), applied driver-side as
    * plain puts into the deserialized slices before the broadcast. A
    * COMMITTED `base_next` (a compaction that crashed before its
    * finish) is preferred over `base`: it already folded the deltas,
    * and re-applying any deltas still on disk is a no-op.
    */
  def loadBloomIndex(spark: SparkSession, root: String): BloomIndex = {
    val (partitions, fpp, perSlice) = bloomMeta(root)
    val baseDir = if (committedNext(root)) bloomNextDir(root)
      else bloomBaseDir(root)
    val slices = scala.collection.mutable.Map[Int,
      org.apache.spark.util.sketch.BloomFilter]()
    spark.read.parquet(baseDir).collect().foreach { r =>
      slices(r.getInt(0)) = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
    }
    val dDir = new java.io.File(bloomDeltasDir(root))
    if (dDir.isDirectory && dDir.list().nonEmpty) {
      // explicit schema: an empty or mid-write delta dir must read as
      // zero rows, never an infer-schema failure
      spark.read.schema("pid INT, fp BIGINT")
        .parquet(bloomDeltasDir(root))
        .select(col("pid"), col("fp")).collect().foreach { r =>
          slices.getOrElseUpdate(r.getInt(0),
            org.apache.spark.util.sketch.BloomFilter.create(perSlice, fpp))
            .putLong(r.getLong(1))
        }
    }
    val bytes = slices.map { case (pid, b) =>
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out)
      pid -> out.toByteArray
    }.toMap
    BloomIndex(partitions, spark.sparkContext.broadcast(bytes))
  }

  /** Fold the streamed deltas into the persisted base and drop them —
    * the family's posting compaction. Every crash window re-loads to
    * the same filter: the folded base lands as a COMMITTED `base_next`
    * before anything is removed ([[loadBloomIndex]] prefers it), a
    * delta surviving past its fold re-applies as a no-op (idempotent
    * puts), and the finish (drop deltas, swap next over base) is
    * re-runnable — never an in-place overwrite of the only base copy.
    */
  def compactBloom(spark: SparkSession, root: String): Unit = {
    import spark.implicits._
    // finish a predecessor that crashed after retiring base: the
    // committed next IS the current filter — swap it in before anything
    // below deletes it
    if (!new java.io.File(bloomBaseDir(root)).exists() &&
        committedNext(root))
      org.apache.commons.io.FileUtils.moveDirectory(
        new java.io.File(bloomNextDir(root)),
        new java.io.File(bloomBaseDir(root)))
    // snapshot the delta batches BEFORE loading: a delta landing while
    // the fold runs may or may not be folded (either is fine — a folded
    // survivor re-applies as a no-op) but must NOT be deleted unfolded
    val dDir = new java.io.File(bloomDeltasDir(root))
    val snapshot = Option(dDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    // fold in memory (load prefers a committed next and applies any
    // deltas), then write to a staging dir NO reader consults — a
    // crash mid-write can never damage a copy load would use
    val idx = loadBloomIndex(spark, root)
    val tmp = s"$root/base_tmp"
    idx.blooms.value.toSeq.toDF("pid", "bloom").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(tmp)
    // enter the preference chain in one directory move (the _SUCCESS
    // commit marker travels with it); only then retire the snapshotted
    // deltas and the old base
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(bloomNextDir(root)))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(tmp), new java.io.File(bloomNextDir(root)))
    snapshot.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(bloomBaseDir(root)))
    org.apache.commons.io.FileUtils.moveDirectory(
      new java.io.File(bloomNextDir(root)),
      new java.io.File(bloomBaseDir(root)))
  }

  /** Batch rows whose fingerprint the responsible Bloom slice accepts —
    * the candidates an exact verify join consumes. Executors
    * deserialize each slice ONCE per JVM (process-level cache keyed on
    * the broadcast id + pid), so the per-row cost is one hash + one
    * bitset probe, plan-side codegen untouched around it.
    */
  def bloomSurvivors(batch: DataFrame, index: BloomIndex): DataFrame = {
    val withFp = batch
      .withColumn("__fp", xxhash64(col("text")))
      .withColumn("__pid",
        pmod(col("__fp"), lit(index.partitions)).cast("int"))
    val schema = withFp.schema
    val fpIdx = schema.fieldIndex("__fp")
    val pidIdx = schema.fieldIndex("__pid")
    val bc = index.blooms
    val survivors = withFp.mapPartitions { it =>
      val cache = scala.collection.mutable.Map[Int,
        org.apache.spark.util.sketch.BloomFilter]()
      def slice(pid: Int) = cache.getOrElseUpdate(pid,
        bc.value.get(pid)
          .map(b => org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(b)))
          .getOrElse(org.apache.spark.util.sketch.BloomFilter.create(1)))
      it.filter(r => slice(r.getInt(pidIdx)).mightContainLong(r.getLong(fpIdx)))
    }(org.apache.spark.sql.Encoders.row(schema))
    survivors.drop("__fp", "__pid")
  }

  /** Ingest-time exact-dup probe through the Bloom prefilter: batch
    * rows the blooms reject are certainly new and never reach the
    * corpus; survivors exact-verify (`text = text` join), so the output
    * is row-identical to the unfiltered exact probe —
    * `(batch_id, corpus doc_id)` per exact content match. DedupSpec
    * gates the pruning rate (survivors ≈ true dups + fpp·|batch|).
    */
  def bloomExactProbe(batch: DataFrame, docs: DataFrame,
      index: BloomIndex): DataFrame = {
    val candidates = bloomSurvivors(batch, index)
    candidates.select(col("batch_id"), col("text"))
      .join(docs.select(col("doc_id"), col("text")), Seq("text"))
      .select(col("batch_id"), col("doc_id"))
  }

  /** Serialized size of a persisted Bloom index (base + delta files) —
    * the broadcast-vs-partitioned routing signal. Pure file metadata, no
    * Spark job.
    */
  def bloomIndexBytes(root: String): Long = {
    def dirBytes(d: String): Long = {
      val f = new java.io.File(d)
      if (f.isDirectory) org.apache.commons.io.FileUtils.sizeOfDirectory(f)
      else 0L
    }
    dirBytes(bloomBaseDir(root)) + dirBytes(bloomNextDir(root)) +
      dirBytes(bloomDeltasDir(root))
  }

  /** Total-filter-bytes ceiling for the driver-fold + broadcast serving
    * path. ~1.2 GB covers ~1B corpus items at 1% fpp; past it the
    * driver fold and the per-executor copy both stop scaling
    * ([[bloomSurvivorsPartitioned]] takes over — at 10B items the
    * per-pid slices are ~12 GB total, which must never transit the
    * driver or replicate per executor).
    */
  val BloomBroadcastMaxBytes: Long = 1200L << 20

  /** Probe a PERSISTED Bloom index without the driver fold: each task
    * deserializes only its partition's slice, read directly from the
    * base table with its pid's streamed delta fingerprints folded in —
    * the per-segment split the reference keeps (its USER_ID bloom lives
    * per record segment, `rust/segment/src/blockfile_record.rs:16`,
    * never as one global filter). One batch shuffle on pid (the slices
    * co-shuffle as one row + a fp list per pid); row-identical to
    * [[bloomSurvivors]] over [[loadBloomIndex]] by construction — same
    * slices, same puts, same probes — gated in DedupSpec.
    */
  def bloomSurvivorsPartitioned(batch: DataFrame, root: String): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val (partitions, fpp, perSlice) = bloomMeta(root)
    val baseDir = if (committedNext(root)) bloomNextDir(root)
      else bloomBaseDir(root)
    val withFp = batch
      .withColumn("__fp", xxhash64(col("text")))
      .withColumn("__pid",
        pmod(col("__fp"), lit(partitions)).cast("int"))
    val schema = withFp.schema
    val fpIdx = schema.fieldIndex("__fp")
    val pidIdx = schema.fieldIndex("__pid")
    val dDir = new java.io.File(bloomDeltasDir(root))
    val deltas =
      if (dDir.isDirectory && dDir.list().nonEmpty)
        spark.read.schema("pid INT, fp BIGINT").parquet(bloomDeltasDir(root))
          .select(col("pid"), col("fp"))
      else Seq.empty[(Int, Long)].toDF("pid", "fp")
    // one row per pid: base slice bytes (null for a delta-only pid the
    // base build never saw) + that pid's delta fingerprints
    val slices = spark.read.parquet(baseDir).select(col("pid"), col("bloom"))
      .join(deltas.groupBy(col("pid"))
        .agg(collect_list(col("fp")).as("fps")), Seq("pid"), "full_outer")
    val batchByPid = withFp.groupByKey(
      _.getInt(pidIdx))(org.apache.spark.sql.Encoders.scalaInt)
    val sliceByPid = slices.groupByKey(
      _.getInt(0))(org.apache.spark.sql.Encoders.scalaInt)
    batchByPid.cogroup(sliceByPid) { (_, rows, sl) =>
      sl.toSeq.headOption match {
        case None => Iterator.empty // pid absent from corpus AND deltas
        case Some(s) =>
          val filter = Option(s.get(1))
            .map(b => org.apache.spark.util.sketch.BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(b.asInstanceOf[Array[Byte]])))
            .getOrElse(org.apache.spark.util.sketch.BloomFilter
              .create(perSlice, fpp))
          Option(s.get(2)).foreach(
            _.asInstanceOf[scala.collection.Seq[Long]]
              .foreach(filter.putLong))
          rows.filter(r => filter.mightContainLong(r.getLong(fpIdx)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      .drop("__fp", "__pid")
  }

  /** Serve a probe from a persisted index, routing on total filter
    * bytes: under [[BloomBroadcastMaxBytes]] the driver folds and
    * broadcasts ([[loadBloomIndex]] — cheapest when the whole index
    * fits every executor); past it the partitioned slice-local probe
    * runs and nothing index-sized ever transits the driver.
    */
  def bloomSurvivorsServed(batch: DataFrame, root: String): DataFrame =
    if (bloomIndexBytes(root) <= BloomBroadcastMaxBytes)
      bloomSurvivors(batch, loadBloomIndex(batch.sparkSession, root))
    else bloomSurvivorsPartitioned(batch, root)
}
