package graft.queries

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup surface over `documents` / `embeddings`.
  *
  * `dd_exact`, `dd_ngram_jaccard`, `dd_emb_top_pairs` are exact and
  * oracle-checked. `dd_minhash_lsh` and `dd_simhash_pairs` are the
  * approximate scale paths: rows-only here, gated in ScalaTest
  * (DedupSpec: LSH output ⊆ exact pairs, recall >= 0.9; simhash sanity).
  */
object DedupPack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> { (s, d) =>
      Dedup.exact(Tables.documents(s, d)).orderBy(col("doc_id"))
    },

    "dd_ngram_jaccard" -> { (s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), threshold = 0.5)
        .orderBy(col("da"), col("db"))
    },

    // Steady-state ingest probe through the partitioned corpus Bloom
    // prefilter: re-ingested rows (doc_id%5) must survive and match,
    // perturbed rows (doc_id%7=1, ' fresh' suffix) are certainly new
    // and drop BEFORE any corpus join. No false negatives + exact
    // verify join ⇒ output row-identical to the unfiltered exact probe,
    // hence oracle-exact despite the approximate filter in the plan.
    "dd_bloom_probe" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("batch_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 7 === 1)
          .select((col("doc_id") + 1000000L).as("batch_id"),
            concat(col("text"), lit(" fresh")).as("text")))
      val idx = Dedup.buildBloomIndex(docs)
      Dedup.bloomExactProbe(batch, docs, idx)
        .orderBy(col("batch_id"), col("doc_id"))
    },

    // Edit-distance verification — the order-sensitive complement to
    // Jaccard: a LOW-threshold candidate pass (jaccard >= 0.05 widens
    // past the near-dup floor) re-verified by Levenshtein similarity
    // >= 0.8, separating byte-level near-dups from same-vocabulary
    // docs. Levenshtein runs on candidate pairs only, never corpus².
    "dd_editdist_verify" -> { (s, d) =>
      Dedup.editSimilarityVerify(Tables.documents(s, d),
          candidateThreshold = 0.05, simThreshold = 0.8)
        .orderBy(col("da"), col("db"))
    },

    // The edit-distance verifier's ingest-time face: candidates from the
    // exact Jaccard probe (|batch postings| x df, never corpus²), the
    // same Levenshtein re-verification — row-identical to
    // dd_editdist_verify restricted to batch-touching pairs.
    "dd_editdist_probe" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.editSimilarityProbe(
          docs.filter(col("doc_id") % 7 === 0).select("doc_id"), docs,
          candidateThreshold = 0.05, simThreshold = 0.8)
        .orderBy(col("da"), col("db"))
    },

    // Leakage-safe split: near-dup clusters (not documents) are the
    // split unit — no val doc can have a train near-twin.
    "dd_leakage_split" -> { (s, d) =>
      Dedup.leakageSafeSplit(Tables.documents(s, d), threshold = 0.5)
        .orderBy(col("doc_id"))
    },

    // C4-style exact span dedup: consecutive 8-word segments, first
    // corpus occurrence kept, later occurrences cut, docs reconstructed.
    "dd_span_dedup" -> { (s, d) =>
      Dedup.spanDedup(Tables.documents(s, d), span = 8)
        .orderBy(col("doc_id"))
    },

    // Lee et al. exact substring dedup: SLIDING 10-word windows (any
    // offset, unlike dd_span_dedup's aligned segments), first corpus
    // occurrence kept, every later occurrence's positions removed,
    // survivors rejoin in order.
    "dd_substring_dedup" -> { (s, d) =>
      Dedup.substringDedup(Tables.documents(s, d), k = 10)
        .orderBy(col("doc_id"))
    },

    // Substring dedup's ingest face: the arriving batch (every 7th doc)
    // is cut against the STORED corpus' windows (corpus immutable,
    // corpus-first priority) plus earlier-in-batch occurrences — the
    // row-identical restriction of the corpus-first full run to batch
    // docs, with only a batch-windows × served-window-set semi-join.
    "dd_substring_probe" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      Dedup.substringProbe(
          docs.filter(col("doc_id") % 7 === 0),
          docs.filter(col("doc_id") % 7 =!= 0), k = 10)
        .orderBy(col("doc_id"))
    },

    "dd_minhash_lsh" -> { (s, d) =>
      // the SERVING form opts into the per-bucket cap explicitly (the
      // public API default stays exhaustive — no silent recall change)
      Dedup.minhashLsh(Tables.documents(s, d), threshold = 0.5,
          maxBucket = Dedup.DefaultMaxBucket)
        .orderBy(col("da"), col("db"))
    },

    "dd_simhash_pairs" -> { (s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), maxDist = 6)
        .orderBy(col("da"), col("db"))
    },

    // Output-proportional LSH dedup — the 100 TB form: cluster labels
    // straight from the banded buckets (per-bucket STAR candidates →
    // exact-Jaccard verify → components), so a cluster of m duplicates
    // costs m label rows where the pair listing costs m²/2. Approximate
    // → rows-only; verified star edges are a subset of the exact
    // threshold graph (precision 1 provably), cluster recall vs the
    // full pair-graph components gated in DedupSpec.
    "dd_minhash_clusters" -> { (s, d) =>
      Dedup.minhashLshClusters(Tables.documents(s, d), threshold = 0.5)
        .orderBy(col("doc_id"))
    },

    // Exhaustive twin of dd_minhash_clusters at threshold 1.0 over the
    // planted-duplicate corpus: all-pairs bucket candidates find every
    // equal-shingle-set pair (equal sets give equal signatures, which
    // collide in EVERY band), and set equality is transitive — so the
    // components are PROVABLY the equal-set groups, hash-exact vs the
    // sorted-set-key grouping oracle. Pins the bucket→component→label
    // machinery the star path reuses.
    "dd_minhash_clusters_oracle" -> { (s, d) =>
      Dedup.minhashLshClusters(doubled(Tables.documents(s, d)),
          threshold = 1.0, exhaustive = true)
        .orderBy(col("doc_id"))
    },

    // Ingest-time probe: near-dup pairs touching an ARRIVING batch only
    // (here every 7th document), found by joining the batch's banded
    // rows against the maintained bucket table — |batch|-scaled, never
    // corpus². Approximate (banding recall) → rows-only; equality with
    // the full pipeline restricted to batch-touching pairs is gated in
    // DedupSpec.
    "dd_minhash_probe" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val batch = docs.filter(col("doc_id") % 7 === 0)
      // cache the banded table: the probe's parameter-validation scan
      // and the candidate join share one signature pass (on the serving
      // path this table is the persisted index — already materialized)
      Dedup.minhashLshProbe(batch, docs,
          graft.sources.CollectionStore.cacheOnce(Dedup.bandedRows(docs)),
          threshold = 0.5)
        .orderBy(col("da"), col("db"))
    },

    // Ingest-time SimHash probe — dd_minhash_probe's Hamming twin: the
    // arriving batch's banded signature rows join the maintained banded
    // table; exact Hamming verify on collisions. Approximate → rows-only;
    // equality with the full pipeline restricted to batch-touching pairs
    // is gated in DedupSpec.
    "dd_simhash_probe" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.simhashProbePairs(docs.filter(col("doc_id") % 7 === 0),
          Dedup.simhashBandRows(docs), maxDist = 6)
        .orderBy(col("da"), col("db"))
    },

    // Exhaustive-mode oracle twin: the planted replica half probes the
    // doubled corpus's banded table at Hamming 0 — equal token multisets
    // force equal signatures, which agree on all four chunks, so the
    // replica pairing is provably found; restricted to it, the output is
    // exactly one row per document (dd_simhash_oracle's certificate
    // through the probe-sided join).
    "dd_simhash_probe_oracle" -> { (s, d) =>
      val all = doubled(Tables.documents(s, d))
      Dedup.simhashProbePairs(all.filter(col("doc_id") >= ReplicaShift),
          Dedup.simhashBandRows(all), maxDist = 0)
        .filter(col("db") === col("da") + ReplicaShift)
        .orderBy(col("da"), col("db"))
    },

    // Ingest-time embedding probe — dd_minhash_probe's dense twin: an
    // arriving vector batch (every 7th vector) assigns to its replica
    // centroids and joins only those posting lists of the SAME served
    // index the ANN queries use; exact-cosine verify at the semdedup
    // threshold. Approximate (cluster-boundary pairs) → rows-only;
    // equality with the full threshold-pair graph restricted to
    // batch-touching pairs is gated in DedupSpec.
    "dd_emb_probe" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id").as("offset_id"), col("embedding"))
      val model = graft.sources.CollectionStore.ivfServing(
        vecs, graft.sources.CollectionStore.indexRoot(d),
        nCentroids = 16, nReplica = 4)
      Dedup.embeddingProbePairs(
          vecs.filter(col("offset_id") % 7 === 0), model,
          threshold = 0.4, nReplica = 4)
        .select(col("va"), col("vb"), col("sim").cast("float").as("sim"))
        .orderBy(col("va"), col("vb"))
    },

    // Exhaustive-mode oracle twin of dd_emb_probe: over the 2-centroid /
    // 2-replica serving model (the dd_emb_ann_oracle root) every vector
    // is in BOTH posting lists, so probe co-membership degenerates to
    // batch × corpus — the result is provably the exact cosine-threshold
    // pair set touching the batch, and DuckDB reproduces it directly.
    "dd_emb_probe_oracle" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id").as("offset_id"), col("embedding"))
      val model = graft.sources.CollectionStore.ivfServing(
        vecs, graft.sources.CollectionStore.indexRoot(d) + "/exh1",
        nCentroids = 2, nReplica = 2)
      Dedup.embeddingProbePairs(
          vecs.filter(col("offset_id") % 7 === 0), model,
          threshold = 0.4, nReplica = 2)
        .select(col("va"), col("vb"), col("sim").cast("float").as("sim"))
        .orderBy(col("va"), col("vb"))
    },

    // Exhaustive-mode oracle twin of dd_minhash_probe: the planted
    // replica half IS the arriving batch, probed at threshold 1.0
    // against the doubled corpus's bucket table. Every J=1.0 pair
    // touching a replica collides in every band (equal shingle sets ⇒
    // equal signatures), so the probe provably finds the oracle's pair
    // set restricted to db in the batch — hash-exact, proving the
    // probe-side narrowing loses no batch-touching pair.
    "dd_minhash_probe_oracle" -> { (s, d) =>
      val all = doubled(Tables.documents(s, d))
      val batch = all.filter(col("doc_id") >= ReplicaShift)
      Dedup.minhashLshProbe(batch, all,
          graft.sources.CollectionStore.cacheOnce(Dedup.bandedRows(all)),
          threshold = 1.0)
        .orderBy(col("da"), col("db"))
    },

    // Exhaustive-mode oracle twin of dd_minhash_lsh: at threshold 1.0 the
    // LSH pipeline is PROVABLY exact through the identical code path. A
    // pair passes the verify filter iff its distinct-shingle sets are
    // equal (inter == na == nb), and equal sets give equal MinHash
    // signatures, which collide in EVERY band — so no qualifying pair can
    // be missed by candidate generation. The corpus is unioned with an
    // id-shifted replica of itself (the standard planted-duplicate
    // composition) so the J=1.0 pair set is non-empty; the oracle finds
    // the same pairs via a sorted-set join key, catching replica pairs
    // AND any cross-document set equality alike — a two-sided gate.
    "dd_minhash_oracle" -> { (s, d) =>
      // the exactness PROOF runs the exhaustive (uncapped) listing —
      // the capped default is the production guard, not the proof path
      Dedup.minhashLsh(doubled(Tables.documents(s, d)), threshold = 1.0,
          maxBucket = Int.MaxValue)
        .orderBy(col("da"), col("db"))
    },

    // Oracle twin of dd_simhash_pairs over the same planted-duplicate
    // corpus: at maxDist 0 a surviving pair has EQUAL 64-bit signatures,
    // and equal signatures agree on all four 16-bit chunks — banding is
    // guaranteed to produce the candidate. Restricted to the replica
    // pairing (db == da + ReplicaShift), the output is provably exactly
    // one row per non-null document: equal token multisets force equal
    // signatures, so no replica pair can be missed (a completeness
    // certificate through the full kernel→band→verify path; false-positive
    // quality is DedupSpec's recall/subset gate on the realistic knobs —
    // distinct near-dup multisets CAN legitimately collide at Hamming 0,
    // which no SQL oracle can predict).
    "dd_simhash_oracle" -> { (s, d) =>
      Dedup.simhashPairs(doubled(Tables.documents(s, d)), maxDist = 0)
        .filter(col("db") === col("da") + ReplicaShift)
        .orderBy(col("da"), col("db"))
    },

    "dd_emb_top_pairs" -> { (s, d) =>
      Dedup.embeddingTopPairs(Tables.embeddings(s, d), k = 20)
    },

    // Bucketed near-dup pairs over the SAME persisted IVF index the ANN
    // queries serve from — candidates from posting co-membership, exact
    // cosine verify. Approximate → rows-only; recall >= 0.9 vs the exact
    // top-20 gated in DedupSpec.
    "dd_emb_ann" -> { (s, d) =>
      val model = graft.sources.CollectionStore.ivfServing(
        Tables.embeddings(s, d).select(col("vec_id").as("offset_id"), col("embedding")),
        graft.sources.CollectionStore.indexRoot(d), nCentroids = 16, nReplica = 4)
      Dedup.embeddingAnnPairs(model, k = 20)
    },

    // SemDeDup-style semantic dedup: connected components over the
    // cosine>=0.4 near-dup graph (candidates from the SAME persisted IVF
    // index), keep the min vec_id per component. Approximate → rows-only;
    // DedupSpec gates pair recall + kept-set agreement vs the exact
    // threshold graph.
    "dd_semdedup" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id").as("offset_id"), col("embedding"))
      val model = graft.sources.CollectionStore.ivfServing(
        vecs, graft.sources.CollectionStore.indexRoot(d),
        nCentroids = 16, nReplica = 4)
      Dedup.semanticDedup(
        Tables.embeddings(s, d), model, threshold = 0.4)
        .orderBy(col("vec_id"))
    },

    // Exhaustive-mode oracle twin of dd_emb_ann: nReplica == nCentroids
    // assigns every vector to EVERY posting list (k-means refuses k=1,
    // so 2 lists with 2-way replication), so co-membership holds for
    // every pair and the bucketed candidates-then-verify code path
    // degenerates to the exact all-pairs top-k — hash-matching the
    // dd_emb_top_pairs oracle. Served from its own index root so the
    // realistic 16-centroid index the ANN queries share is untouched.
    "dd_emb_ann_oracle" -> { (s, d) =>
      val model = graft.sources.CollectionStore.ivfServing(
        Tables.embeddings(s, d).select(col("vec_id").as("offset_id"), col("embedding")),
        graft.sources.CollectionStore.indexRoot(d) + "/exh1", nCentroids = 2,
        nReplica = 2)
      Dedup.embeddingAnnPairs(model, k = 20)
    },

    // Exhaustive twin of dd_semdedup: the all-lists replication yields
    // the EXACT cosine-threshold graph, so the connected-components +
    // min-id-keep pipeline must land on the recursive-CTE oracle.
    "dd_semdedup_oracle" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id").as("offset_id"), col("embedding"))
      val model = graft.sources.CollectionStore.ivfServing(
        vecs, graft.sources.CollectionStore.indexRoot(d) + "/exh1",
        nCentroids = 2, nReplica = 2)
      Dedup.semanticDedup(
        Tables.embeddings(s, d), model, threshold = 0.4)
        .orderBy(col("vec_id"))
    },

    // Near-dup clusters: connected components over the exact jaccard
    // pair graph (min-label propagation), each doc tagged with its
    // cluster's canonical (min) id and cluster size — the keep-one-per-
    // cluster step of corpus dedup. Oracle: DuckDB recursive CTE over
    // the identical pair set.
    "dd_dup_clusters" -> { (s, d) =>
      Dedup.dupClusters(Tables.documents(s, d), threshold = 0.5)
        .orderBy(col("doc_id"))
    },

    // Incremental cluster maintenance: the arriving batch (every 7th
    // document) attaches to the corpus's EXISTING near-dup clusters from
    // batch-touching pairs alone — the full fixpoint never re-runs, yet
    // restricted to the batch the assignment is provably identical to a
    // corpus-wide re-cluster (corpus endpoints anchor as their stored
    // label = cluster minimum). Hash-exact vs the recursive-CTE oracle
    // over ALL documents filtered to the batch.
    "dd_cluster_attach" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val isBatch = col("doc_id") % 7 === 0
      // the corpus's cluster labels are PERSISTED dedup state, maintained
      // at compaction (the same build-once/serve-many contract as the ANN
      // indexes) — the attach reads them, never re-clusters
      val root = graft.sources.CollectionStore.indexRoot(d)
      graft.sources.CollectionStore.ensureBuilt(root, "dupclusters7",
          "thr0.5-v1") {
        Dedup.dupClusters(docs.filter(!isBatch), threshold = 0.5)
          .select(col("doc_id"), col("cluster"))
          .write.mode("overwrite").parquet(s"$root/dupclusters7/data")
      }
      val labels = s.read.parquet(s"$root/dupclusters7/data")
      val pairs = Dedup.jaccardProbePairs(
          docs.filter(isBatch).select("doc_id"), docs, threshold = 0.5)
        .select(col("da"), col("db"))
      Dedup.assignToClusters(docs.filter(isBatch), pairs, labels)
        .select(col("doc_id"), col("cluster"))
        .orderBy(col("doc_id"))
    },

    // Benchmark-contamination check: train docs sharing any word-4-gram
    // with the eval split (doc_id % 20 == 0 stands in for a benchmark
    // set). Eval shingle sets are small by construction (benchmarks are
    // KBs, corpora are TBs) → broadcast the eval side so the 100-TB train
    // scan joins map-side with NO shuffle; the only shuffle is the final
    // per-doc count. Mirrors the inverted-index shape of jaccardPairs.
    "dd_contamination" -> { (s, d) =>
      // the shingle table feeds both the eval and the train side — cache
      // it so tokenize+shingle runs once (a persisted temp table at scale)
      val sh = graft.sources.CollectionStore.cacheOnce(
        Tables.documents(s, d).select(col("doc_id"),
          explode(graft.operators.TextStats.shingles(
            graft.operators.TextStats.tokens(col("text")), 4)).as("sg")))
      val evalSh = sh.filter(col("doc_id") % 20 === 0).select("sg").distinct()
      sh.filter(col("doc_id") % 20 =!= 0)
        .join(broadcast(evalSh), Seq("sg"))
        // shingles() is distinct-per-doc, so count(*) == distinct count
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    },
  )

  /** Offset separating the planted replica's doc_ids from the originals
    * in the `*_oracle` twin corpora (far above any real doc_id at test
    * SFs).
    */
  val ReplicaShift: Long = 1000000L

  /** The corpus unioned with an id-shifted copy of itself — plants one
    * known exact duplicate per document for the dedup oracle twins.
    */
  private[queries] def doubled(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base.unionAll(base.select((col("doc_id") + ReplicaShift).as("doc_id"),
      col("text")))
  }

  /** The shingle CTE shared with StreamingPack's cluster-maintenance
    * oracle. */
  private[queries] def sqlShinglesCte: String = sqlShingles

  private val sqlShingles =
    """toks AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (SELECT doc_id,
      |    CASE WHEN len(t) >= 3
      |         THEN list_distinct(list_transform(range(1, len(t)-1),
      |                i -> array_to_string(t[i:i+2], ' ')))
      |         ELSE [] END AS s
      |  FROM toks)""".stripMargin

  /** DuckDB rebuild of the edit-similarity family (df-capped Jaccard
    * candidates at 0.05, Levenshtein keep at 0.8) with the pair
    * restriction injected — `TRUE` is the corpus-wide verifier,
    * a batch predicate the ingest probe's contract (the probe's pair
    * set IS the corpus-wide set restricted to batch-touching pairs).
    */
  private def sqlEditDist(pairFilter: String): String =
    s"""WITH $sqlShingles,
       |ex0 AS (SELECT doc_id, unnest(s) AS sg FROM sh),
       |dfreq AS (SELECT sg FROM ex0 GROUP BY sg
       |          HAVING count(*) <= ${graft.operators.Dedup.DefaultMaxDf}),
       |ex AS (SELECT ex0.doc_id, ex0.sg FROM ex0 JOIN dfreq USING (sg)),
       |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
       |          FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
       |j AS (SELECT da, db, inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
       |      FROM pairs JOIN sizes sa ON da = sa.doc_id
       |      JOIN sizes sb ON db = sb.doc_id
       |      WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.05
       |        AND $pairFilter),
       |ed AS (SELECT da, db, jaccard,
       |         levenshtein(a.text, b.text)::BIGINT AS lev,
       |         1.0 - levenshtein(a.text, b.text)::DOUBLE
       |           / greatest(length(a.text), length(b.text)) AS edit_sim
       |       FROM j JOIN documents a ON da = a.doc_id
       |       JOIN documents b ON db = b.doc_id)
       |SELECT da, db, jaccard, lev, edit_sim FROM ed
       |WHERE edit_sim >= 0.8 ORDER BY da, db""".stripMargin

  val oracle: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,

    // perturbed batch rows (' fresh') match nothing; re-ingested rows
    // match every corpus doc sharing their text
    "dd_bloom_probe" ->
      """SELECT b.doc_id AS batch_id, c.doc_id AS doc_id
        |FROM documents b JOIN documents c ON b.text = c.text
        |WHERE b.doc_id%5=0
        |ORDER BY batch_id, doc_id""".stripMargin,

    "dd_span_dedup" ->
      """WITH words AS (
        |  SELECT doc_id, generate_subscripts(w, 1) - 1 AS wi, unnest(w) AS word
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |segs AS (
        |  SELECT doc_id, wi // 8 AS seg_idx,
        |         string_agg(word, ' ' ORDER BY wi) AS seg
        |  FROM words GROUP BY 1, 2),
        |firsts AS (
        |  SELECT doc_id, seg_idx, seg,
        |         row_number() OVER (PARTITION BY seg
        |                            ORDER BY doc_id, seg_idx) AS rn
        |  FROM segs)
        |SELECT doc_id,
        |  coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
        |             FILTER (WHERE rn = 1), '') AS kept_text,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN rn <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dd_substring_dedup" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |wins AS (
        |  SELECT doc_id, i - 1 AS start, array_to_string(t[i:i+9], ' ') AS win
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 8)) AS i
        |        FROM tk WHERE len(t) >= 10)),
        |dup AS (
        |  SELECT doc_id, start FROM (
        |    SELECT doc_id, start,
        |           row_number() OVER (PARTITION BY win
        |                              ORDER BY doc_id, start) AS rn
        |    FROM wins) WHERE rn > 1),
        |cov AS (SELECT DISTINCT doc_id, start + unnest(range(0, 10)) AS wi
        |        FROM dup),
        |sp AS (SELECT doc_id, wi,
        |         lag(wi) OVER (PARTITION BY doc_id ORDER BY wi) AS prev
        |       FROM cov),
        |agg AS (SELECT doc_id, count(*) AS n_removed,
        |          sum(CASE WHEN prev IS NULL OR wi - prev > 1
        |              THEN 1 ELSE 0 END) AS n_spans
        |        FROM sp GROUP BY doc_id),
        |words AS (
        |  SELECT doc_id, generate_subscripts(t, 1) - 1 AS wi, unnest(t) AS word
        |  FROM tk),
        |kept AS (
        |  SELECT w.doc_id, count(*) AS n_toks,
        |    coalesce(string_agg(w.word, ' ' ORDER BY w.wi)
        |               FILTER (WHERE c.wi IS NULL), '') AS kept_text
        |  FROM words w LEFT JOIN cov c ON w.doc_id = c.doc_id AND w.wi = c.wi
        |  GROUP BY w.doc_id)
        |SELECT k.doc_id, k.n_toks::BIGINT AS n_toks,
        |  coalesce(a.n_removed, 0)::BIGINT AS n_removed,
        |  coalesce(a.n_spans, 0)::BIGINT AS n_spans, k.kept_text
        |FROM kept k LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // the corpus ∪ batch run under corpus-first priority, restricted to
    // batch docs — the probe's provable contract (ORDER BY in_batch puts
    // every stored occurrence ahead of any batch occurrence)
    "dd_substring_probe" ->
      """WITH tk AS (SELECT doc_id, doc_id % 7 = 0 AS in_batch,
        |                   string_split(text, ' ') AS t FROM documents),
        |wins AS (
        |  SELECT doc_id, in_batch, i - 1 AS start,
        |         array_to_string(t[i:i+9], ' ') AS win
        |  FROM (SELECT doc_id, in_batch, t, unnest(range(1, len(t) - 8)) AS i
        |        FROM tk WHERE len(t) >= 10)),
        |dup AS (
        |  SELECT doc_id, start FROM (
        |    SELECT doc_id, in_batch, start,
        |           row_number() OVER (PARTITION BY win
        |                              ORDER BY in_batch, doc_id, start) AS rn
        |    FROM wins) WHERE rn > 1 AND in_batch),
        |cov AS (SELECT DISTINCT doc_id, start + unnest(range(0, 10)) AS wi
        |        FROM dup),
        |sp AS (SELECT doc_id, wi,
        |         lag(wi) OVER (PARTITION BY doc_id ORDER BY wi) AS prev
        |       FROM cov),
        |agg AS (SELECT doc_id, count(*) AS n_removed,
        |          sum(CASE WHEN prev IS NULL OR wi - prev > 1
        |              THEN 1 ELSE 0 END) AS n_spans
        |        FROM sp GROUP BY doc_id),
        |words AS (
        |  SELECT doc_id, generate_subscripts(t, 1) - 1 AS wi, unnest(t) AS word
        |  FROM tk WHERE in_batch),
        |kept AS (
        |  SELECT w.doc_id, count(*) AS n_toks,
        |    coalesce(string_agg(w.word, ' ' ORDER BY w.wi)
        |               FILTER (WHERE c.wi IS NULL), '') AS kept_text
        |  FROM words w LEFT JOIN cov c ON w.doc_id = c.doc_id AND w.wi = c.wi
        |  GROUP BY w.doc_id)
        |SELECT k.doc_id, k.n_toks::BIGINT AS n_toks,
        |  coalesce(a.n_removed, 0)::BIGINT AS n_removed,
        |  coalesce(a.n_spans, 0)::BIGINT AS n_spans, k.kept_text
        |FROM kept k LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "dd_ngram_jaccard" ->
      s"""WITH $sqlShingles,
         |ex0 AS (SELECT doc_id, unnest(s) AS sg FROM sh),
         |dfreq AS (SELECT sg FROM ex0 GROUP BY sg
         |          HAVING count(*) <= ${graft.operators.Dedup.DefaultMaxDf}),
         |ex AS (SELECT ex0.doc_id, ex0.sg FROM ex0 JOIN dfreq USING (sg)),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
         |          FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh)
         |SELECT da, db, inter, sa.n AS na, sb.n AS nb,
         |  inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
         |FROM pairs JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
         |WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.5
         |ORDER BY da, db""".stripMargin,

    "dd_editdist_verify" -> sqlEditDist("TRUE"),

    // the corpus-wide SQL restricted to batch-touching pairs — the
    // probe's provable contract
    "dd_editdist_probe" -> sqlEditDist("(da % 7 = 0 OR db % 7 = 0)"),

    // threshold-1.0 LSH over the planted-duplicate corpus == identical
    // distinct-shingle sets (see the query's proof sketch); '|' never
    // occurs in [a-z0-9 ] shingles so the sorted join key is injective
    "dd_minhash_oracle" ->
      """WITH docs2 AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM docs2),
        |sh AS (SELECT doc_id,
        |    CASE WHEN len(t) >= 3
        |         THEN list_distinct(list_transform(range(1, len(t)-1),
        |                i -> array_to_string(t[i:i+2], ' ')))
        |         ELSE [] END AS s
        |  FROM toks),
        |keys AS (SELECT doc_id, array_to_string(list_sort(s), '|') AS k
        |         FROM sh WHERE len(s) > 0)
        |SELECT a.doc_id AS da, b.doc_id AS db, 1.0::DOUBLE AS jaccard
        |FROM keys a JOIN keys b ON a.k = b.k AND a.doc_id < b.doc_id
        |ORDER BY da, db""".stripMargin,

    // equal-set groups labeled by their min doc_id; docs with no (or a
    // unique) shingle set self-cluster — exactly the exhaustive
    // threshold-1.0 component structure (set equality is transitive)
    "dd_minhash_clusters_oracle" ->
      """WITH docs2 AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM docs2),
        |sh AS (SELECT doc_id,
        |    CASE WHEN len(t) >= 3
        |         THEN list_distinct(list_transform(range(1, len(t)-1),
        |                i -> array_to_string(t[i:i+2], ' ')))
        |         ELSE [] END AS s
        |  FROM toks),
        |keys AS (SELECT doc_id, array_to_string(list_sort(s), '|') AS k
        |         FROM sh WHERE len(s) > 0),
        |lab AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY k) AS cluster
        |        FROM keys)
        |SELECT d.doc_id, coalesce(lab.cluster, d.doc_id) AS cluster
        |FROM docs2 d LEFT JOIN lab USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // exhaustive probe == exact cosine-threshold pairs touching the batch
    "dd_emb_probe_oracle" ->
      """SELECT a.vec_id AS va, b.vec_id AS vb,
        |  CAST(list_cosine_similarity(a.embedding, b.embedding) AS FLOAT) AS sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < b.vec_id
        |  AND (a.vec_id % 7 = 0 OR b.vec_id % 7 = 0)
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |ORDER BY va, vb""".stripMargin,

    // dd_minhash_oracle restricted to pairs touching the replica batch:
    // da < db, so "at least one side >= shift" reduces to db >= shift
    "dd_minhash_probe_oracle" ->
      """WITH docs2 AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM docs2),
        |sh AS (SELECT doc_id,
        |    CASE WHEN len(t) >= 3
        |         THEN list_distinct(list_transform(range(1, len(t)-1),
        |                i -> array_to_string(t[i:i+2], ' ')))
        |         ELSE [] END AS s
        |  FROM toks),
        |keys AS (SELECT doc_id, array_to_string(list_sort(s), '|') AS k
        |         FROM sh WHERE len(s) > 0)
        |SELECT a.doc_id AS da, b.doc_id AS db, 1.0::DOUBLE AS jaccard
        |FROM keys a JOIN keys b ON a.k = b.k AND a.doc_id < b.doc_id
        |WHERE b.doc_id >= 1000000
        |ORDER BY da, db""".stripMargin,

    // replica pairs: provably present at Hamming 0 (equal token
    // multisets force equal signatures), provably nothing else under the
    // db == da + shift restriction
    "dd_simhash_oracle" ->
      """SELECT doc_id AS da, doc_id + 1000000 AS db, 0::INT AS hamming
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY da""".stripMargin,

    "dd_simhash_probe_oracle" ->
      """SELECT doc_id AS da, doc_id + 1000000 AS db, 0::INT AS hamming
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY da""".stripMargin,

    "dd_emb_top_pairs" ->
      """SELECT a.vec_id AS va, b.vec_id AS vb,
        |  list_cosine_similarity(a.embedding, b.embedding) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY sim DESC, va, vb LIMIT 20""".stripMargin,

    // exhaustive-probe twin: the bucketed path IS the all-pairs top-k
    "dd_emb_ann_oracle" ->
      """SELECT a.vec_id AS va, b.vec_id AS vb,
        |  list_cosine_similarity(a.embedding, b.embedding) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY sim DESC, va, vb LIMIT 20""".stripMargin,

    // exact cosine>=0.4 threshold graph -> connected components ->
    // min-id keep, as a recursive CTE (the dd_dup_clusters pattern)
    "dd_semdedup_oracle" ->
      """WITH RECURSIVE jp AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),
        |und AS (SELECT va AS src, vb AS dst FROM jp
        |        UNION ALL SELECT vb, va FROM jp),
        |cc(node, label) AS (
        |  SELECT DISTINCT src, src FROM und
        |  UNION
        |  SELECT und.src, cc.label FROM und JOIN cc ON und.dst = cc.node),
        |lab AS (SELECT node, min(label) AS keep FROM cc GROUP BY node)
        |SELECT e.vec_id, coalesce(lab.keep, e.vec_id) AS keep_id,
        |       (e.vec_id <> coalesce(lab.keep, e.vec_id)) AS is_dup
        |FROM embeddings e LEFT JOIN lab ON e.vec_id = lab.node
        |ORDER BY vec_id""".stripMargin,

    "dd_leakage_split" ->
      s"""WITH RECURSIVE $sqlShingles,
         |ex0 AS (SELECT doc_id, unnest(s) AS sg FROM sh),
         |dfreq AS (SELECT sg FROM ex0 GROUP BY sg
         |          HAVING count(*) <= ${graft.operators.Dedup.DefaultMaxDf}),
         |ex AS (SELECT ex0.doc_id, ex0.sg FROM ex0 JOIN dfreq USING (sg)),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
         |          FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         |jp AS (SELECT da, db FROM pairs
         |       JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
         |       WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.5),
         |und AS (SELECT da AS src, db AS dst FROM jp
         |        UNION ALL SELECT db, da FROM jp),
         |cc(node, label) AS (
         |  SELECT DISTINCT src, src FROM und
         |  UNION
         |  SELECT und.src, cc.label FROM und JOIN cc ON und.dst = cc.node),
         |lab AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node)
         |SELECT d.doc_id,
         |  coalesce(lab.cluster, d.doc_id) AS cluster,
         |  CASE WHEN substring(md5(CAST(coalesce(lab.cluster, d.doc_id)
         |                               AS VARCHAR)), 1, 2) < '1a'
         |       THEN 'val' ELSE 'train' END AS split
         |FROM documents d LEFT JOIN lab ON d.doc_id = lab.node
         |ORDER BY d.doc_id""".stripMargin,

    "dd_dup_clusters" ->
      s"""WITH RECURSIVE $sqlShingles,
         |ex0 AS (SELECT doc_id, unnest(s) AS sg FROM sh),
         |dfreq AS (SELECT sg FROM ex0 GROUP BY sg
         |          HAVING count(*) <= ${graft.operators.Dedup.DefaultMaxDf}),
         |ex AS (SELECT ex0.doc_id, ex0.sg FROM ex0 JOIN dfreq USING (sg)),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
         |          FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         |jp AS (SELECT da, db FROM pairs
         |       JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
         |       WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.5),
         |und AS (SELECT da AS src, db AS dst FROM jp
         |        UNION ALL SELECT db, da FROM jp),
         |cc(node, label) AS (
         |  SELECT DISTINCT src, src FROM und
         |  UNION
         |  SELECT und.src, cc.label FROM und JOIN cc ON und.dst = cc.node),
         |lab AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node),
         |sz AS (SELECT cluster, count(*) AS csize FROM lab GROUP BY cluster)
         |SELECT lab.node AS doc_id, lab.cluster, sz.csize
         |FROM lab JOIN sz USING (cluster)
         |ORDER BY doc_id""".stripMargin,

    // the full-corpus fixpoint restricted to the batch — incremental
    // attach must land every batch doc on the same label
    "dd_cluster_attach" ->
      s"""WITH RECURSIVE $sqlShingles,
         |ex0 AS (SELECT doc_id, unnest(s) AS sg FROM sh),
         |dfreq AS (SELECT sg FROM ex0 GROUP BY sg
         |          HAVING count(*) <= ${graft.operators.Dedup.DefaultMaxDf}),
         |ex AS (SELECT ex0.doc_id, ex0.sg FROM ex0 JOIN dfreq USING (sg)),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
         |          FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         |jp AS (SELECT da, db FROM pairs
         |       JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
         |       WHERE inter::DOUBLE / (sa.n + sb.n - inter) >= 0.5),
         |und AS (SELECT da AS src, db AS dst FROM jp
         |        UNION ALL SELECT db, da FROM jp),
         |cc(node, label) AS (
         |  SELECT DISTINCT src, src FROM und
         |  UNION
         |  SELECT und.src, cc.label FROM und JOIN cc ON und.dst = cc.node),
         |lab AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node)
         |SELECT d.doc_id, coalesce(lab.cluster, d.doc_id) AS cluster
         |FROM documents d LEFT JOIN lab ON d.doc_id = lab.node
         |WHERE d.doc_id % 7 = 0
         |ORDER BY d.doc_id""".stripMargin,

    "dd_contamination" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(
        |    CASE WHEN len(t) >= 4
        |         THEN list_distinct(list_transform(range(1, len(t)-2),
        |                i -> array_to_string(t[i:i+3], ' ')))
        |         ELSE [] END) AS sg
        |  FROM toks),
        |ev AS (SELECT DISTINCT sg FROM sh WHERE doc_id % 20 = 0)
        |SELECT a.doc_id, count(*) AS n_shared
        |FROM sh a JOIN ev USING (sg)
        |WHERE a.doc_id % 20 <> 0
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,
  )
}
