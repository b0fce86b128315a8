package graft.queries

import graft.Tables
import graft.api.Collection
import graft.model.WhereParser
import graft.operators.Rank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end Chroma API facade: the full Knn and Search plans driven
  * through [[Collection]] with filters arriving as the JSON `$`-DSL
  * (parsed by [[WhereParser]]), exactly as a client would send them.
  */
object FacadePack extends QueryPack {

  /** embeddings.parquet as a collection: meta_int.label always present,
    * meta_bool.even present iff vec_id % 3 != 0 (missing-key semantics).
    */
  def vecCollection(s: SparkSession, d: String): Collection = {
    import s.implicits._
    val df = Tables.embeddings(s, d).select(
      concat(lit("vec-"), $"vec_id").as("id"),
      $"vec_id".as("offset_id"),
      $"embedding",
      lit(null).cast("string").as("document"),
      lit(null).cast("string").as("uri"),
      map_from_arrays(array(), array()).cast("map<string,string>").as("meta_str"),
      map(lit("label"), $"label".cast("long")).as("meta_int"),
      map_from_arrays(array(), array()).cast("map<string,double>").as("meta_float"),
      when($"vec_id" % 3 =!= 0, map(lit("even"), ($"vec_id" % 2 === 0)))
        .otherwise(map_from_arrays(array(), array()).cast("map<string,boolean>"))
        .as("meta_bool"))
    new Collection(df)
  }

  private def queryVecs(s: SparkSession, d: String, n: Int): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))

  private val sparseTerms = Seq("query", "data", "filter", "spark")

  /** (doc_id, term, tf, term_id) term frequencies over documents. */
  private def docsTf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(graft.operators.TextStats.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("term_id", xxhash64(col("term")))

  /** documents as a collection carrying a `tf_bow` sparse vector per record
    * in `meta_sparse` — `MetadataValue::SparseVector` as a first-class
    * record column (indices = xxhash64(term), values = term frequency).
    * Pass an externally-cached `tf` when the query also derives corpus
    * stats from it (single tokenize pass).
    */
  def docsSparseCollection(s: SparkSession, d: String,
      tf0: Option[DataFrame] = None): Collection = {
    val base = ChromaCore.docsCollection(s, d).records
    val tf = tf0.getOrElse(docsTf(s, d))
    val sv = tf.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("term_id"), col("tf")))).as("p"))
      .select(col("doc_id").as("offset_id"),
        struct(col("p.term_id").as("indices"),
          col("p.tf").cast("array<float>").as("values")).as("sv"))
    new Collection(
      base.join(sv, Seq("offset_id"), "left")
        .withColumn("meta_sparse", map(lit("tf_bow"), col("sv"))).drop("sv"))
  }

  private def sparseTermIds(s: SparkSession): Seq[Long] = {
    val r = s.range(1)
      .select(sparseTerms.map(t => xxhash64(lit(t))): _*).collect()(0)
    sparseTerms.indices.map(r.getLong)
  }

  /** Documents as a CLIENT collection with a declared `tf_bow` sparse key
    * (per-key `indexed` toggles the served Block-Max posting index vs
    * the in-plan scan). Ids zero-pad so offset order == numeric doc_id
    * order (deterministic k-boundary ties against the oracle).
    */
  private def sparseClientCollection(s: SparkSession, d: String,
      name: String, indexed: Boolean): graft.api.CollectionHandle = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_${name}_q").toString
    val client = new graft.api.Client(s, root)
    val coll = client.createCollection(name, graft.sources.Catalog.Schema(
      keys = Map("tf_bow" -> graft.sources.Catalog.KeyConfig(
        graft.sources.Catalog.VSparseVector, indexed = indexed))))
    val sv = docsTf(s, d).groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("term_id"), col("tf")))).as("p"))
      .select(col("doc_id"),
        struct(col("p.term_id").as("indices"),
          col("p.tf").cast("array<float>").as("values")).as("sv"))
    coll.add(Tables.documents(s, d).join(sv, Seq("doc_id"), "left").select(
      format_string("doc-%08d", col("doc_id")).as("id"),
      col("text").as("document"),
      when(col("sv").isNotNull, map(lit("tf_bow"), col("sv"))).as("meta_sparse")))
    coll.persist()
    coll
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Knn plan with a JSON-DSL pre-filter (filter-before-KNN order).
    "fc_query_filtered" -> { (s, d) =>
      val where = WhereParser.parse(
        """{"$and": [{"label": {"$ne": 3}}, {"even": {"$eq": true}}]}""")
      vecCollection(s, d)
        .query(queryVecs(s, d, 3), k = 5, where = Some(where))
        .select(col("query_id"), col("rank"), col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // query() with a NESTED-BOOLEAN metadata filter through the shared
    // recursive bitmap router: the collection declares inverted indexes
    // on both keys, so each Or branch's eq legs probe their posting
    // tables before the exact in-plan KNN scores the survivors — the
    // reference's filter-first KnnFilterOrchestrator over a RoaringBitmap
    // Or(And, And) expression. Brute-force KNN ⇒ hash-exact.
    "fc_query_bool_nested" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/qbn_client"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("qbn", graft.sources.Catalog.Schema(
        keys = Map(
          "label" -> graft.sources.Catalog.KeyConfig(
            graft.sources.Catalog.VInt, invertedIndex = Some(true)),
          "even" -> graft.sources.Catalog.KeyConfig(
            graft.sources.Catalog.VBool, invertedIndex = Some(true)))))
      if (!graft.sources.CollectionStore.hasRecords(coll.ref.dataRoot)) {
        // `even` exists iff vec_id % 3 != 0 (missing-key rows must never
        // surface through a posting probe)
        coll.add(Tables.embeddings(s, d).select(
          concat(lit("vec-"), col("vec_id")).as("id"), col("embedding"),
          map(lit("label"), col("label").cast("long")).as("meta_int"),
          when(col("vec_id") % 3 =!= 0,
            map(lit("even"), col("vec_id") % 2 === 0))
            .otherwise(map_from_arrays(array(), array())
              .cast("map<string,boolean>")).as("meta_bool")))
        coll.persist()
      }
      import graft.model.Where
      coll.query(queryVecs(s, d, 3), k = 5, where = Some(Where.Or(Seq(
          Where.And(Seq(Where.Cmp("label", "$eq", Where.VInt(1)),
            Where.Cmp("even", "$eq", Where.VBool(true)))),
          Where.And(Seq(Where.Cmp("label", "$eq", Where.VInt(2)),
            Where.Cmp("even", "$eq", Where.VBool(false))))))))
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // query() with the QueryRequest's THREE separate filter fields —
    // ids, where, where_document (`api_types.rs` QueryRequestPayload:
    // 2207-2215) — conjoined at plan time exactly like get()'s: the id
    // restriction, a metadata range, and a document substring all narrow
    // the candidate set before the exact in-plan KNN. Brute-force KNN
    // over the survivors ⇒ hash-exact.
    "fc_query_request_fields" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/qrf_client"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("qrf")
      if (!graft.sources.CollectionStore.hasRecords(coll.ref.dataRoot)) {
        coll.add(Tables.documents(s, d)
          .join(Tables.embeddings(s, d),
            col("doc_id") === col("vec_id"))
          .select(concat(lit("doc-"), col("doc_id")).as("id"),
            col("text").as("document"), col("embedding"),
            map(lit("label"), col("label").cast("long")).as("meta_int")))
        coll.persist()
      }
      import graft.model.Where
      // the explicit user-id list every SF reproduces as doc_id % 2 = 0
      val evenIds = (0L until Tables.documents(s, d).count() by 2L)
        .map(i => s"doc-$i")
      coll.query(queryVecs(s, d, 3), k = 5,
          where = Some(Where.Cmp("label", "$ne", Where.VInt(3))),
          ids = Some(evenIds),
          whereDocument = Some(Where.DocContains("data", negated = false)))
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Search plan: two KNN leaves, weighted-sum rank, top-1 per label.
    "fc_search_grouped" -> { (s, d) =>
      import Rank._
      val q0 = queryVecs(s, d, 1)
      val q1 = queryVecs(s, d, 2).filter(col("query_id") === 1)
      vecCollection(s, d)
        .search(
          leaves = Seq((q0, 50, "cosine"), (q1, 50, "cosine")),
          rank = Sum(Seq(Mul(Seq(Val(0.6), Leaf(0, default = 2.0))),
                         Mul(Seq(Val(0.4), Leaf(1, default = 2.0))))),
          groupBy = Some((Seq(element_at(col("meta_int"), "label")), 1)),
          limit = Some(10),
          include = Seq(col("meta_int")))
        .select(col("id"), col("#score").as("score"),
          element_at(col("meta_int"), "label").as("label"))
        .orderBy(col("score"), col("id"))
    },
    // Aggregate MULTI-KEY ordering (Aggregate::MaxK{keys:
    // [field, Score]}, operator.rs:2306-2323): per even-group keep the
    // top-2 by (label desc, score desc) — the aggregate's own sort keys,
    // not the score default. Missing `even` forms the Null group.
    "fc_search_grouped_keys" -> { (s, d) =>
      val v = Tables.embeddings(s, d).filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0).getSeq[Float](0)
      val payload =
        s"""{
           |  "rank": {"$$knn": {"query": [${v.mkString(",")}], "limit": 50}},
           |  "group_by": {"keys": ["even"],
           |    "aggregate": {"$$max_k": {"keys": ["label", "#score"], "k": 2}}},
           |  "limit": {"limit": 10},
           |  "select": {"keys": ["label", "even"]}
           |}""".stripMargin
      vecCollection(s, d).searchPayload(payload)
        .select(col("id"), col("#score").cast("float").as("score"),
          col("label"), col("even"))
        .orderBy(col("score"), col("id"))
    },

    // Search payload with a RAW-TEXT $knn leaf — the reference's
    // Knn(query="...") form: the engine embeds the string server-side
    // with the collection's embedding function (query side of the
    // protocol). The fitted tf-idf function makes the whole path —
    // vocabulary fit, doc embed-at-write, query embed, cosine KNN,
    // score slice — SQL-expressible, so this is hash-exact.
    "fc_search_text" -> { (s, d) =>
      val ef = graft.functions.EmbeddingFunctions.VocabTfIdfDense.fit(
        Tables.documents(s, d), "text", dim = 64)
      val recs = graft.sources.CollectionStore.cacheOnce(
        ef.embedDf(Tables.documents(s, d), "text", "embedding")
          .filter(exists(col("embedding"), x => x =!= 0f))
          .select(col("doc_id").as("offset_id"),
            concat(lit("doc-"), col("doc_id")).as("id"),
            col("text").as("document"), col("embedding")))
      new Collection(recs).searchPayload(
        """{"rank": {"$knn": {"query": "spark data query", "limit": 10}},
          |  "limit": {"limit": 10},
          |  "select": {"keys": ["#score"]}}""".stripMargin,
        embed = Some(ef))
        .select(col("id"), col("#score").cast("float").as("score"))
        .orderBy(col("score"), col("id"))
    },

    // Search plan arriving as the reference's WIRE JSON payload
    // (SearchPayload: filter + $knn rank algebra + group_by + limit +
    // select), built exactly as a client would — query embeddings
    // collected into the payload literal (2 rows; client-side query
    // construction, not an engine collect), then parsed and compiled to
    // ONE Catalyst plan by SearchParser/Collection.searchPayload.
    "fc_search_json" -> { (s, d) =>
      val qs = Tables.embeddings(s, d).filter(col("vec_id") < 2)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      def vec(id: Long) = qs(id).mkString("[", ",", "]")
      val payload =
        s"""{
           |  "filter": {"label": {"$$ne": 4}},
           |  "rank": {"$$sum": [
           |    {"$$mul": [{"$$val": 0.7}, {"$$knn":
           |      {"query": ${vec(0)}, "limit": 50, "default": 2.0}}]},
           |    {"$$mul": [{"$$val": 0.3}, {"$$knn":
           |      {"query": ${vec(1)}, "limit": 50, "default": 2.0}}]}]},
           |  "group_by": {"keys": ["label"],
           |    "aggregate": {"$$min_k": {"keys": ["#score"], "k": 1}}},
           |  "limit": {"offset": 0, "limit": 10},
           |  "select": {"keys": ["#score", "label"]}
           |}""".stripMargin
      vecCollection(s, d).searchPayload(payload)
        .select(col("id"), col("#score").as("score"), col("label"))
        .orderBy(col("score"), col("id"))
    },

    // Served-ANN query through the facade: the collection's persisted IVF
    // index answers, candidates re-join record content. Approximate →
    // rows-only; recall gates live in IvfSpec.
    "fc_ann_query" -> { (s, d) =>
      val model = graft.sources.CollectionStore.ivfServing(
        graft.Tables.embeddings(s, d)
          .select(col("vec_id").as("offset_id"), col("embedding")),
        graft.sources.CollectionStore.indexRoot(d), nCentroids = 16, nReplica = 4)
      val queries = graft.Tables.embeddings(s, d).filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      vecCollection(s, d)
        .queryAnn(model, queries, k = 5, nprobe = 4)
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // The composed quantized-SPANN stack through the user facade:
    // routing + pruned probe + coarse rank on persisted rotated codes +
    // exact re-rank + record-content join. Approximate → rows-only;
    // composition recall gated in IvfSpec.
    "fc_ann_quantized" -> { (s, d) =>
      val vecs = graft.Tables.embeddings(s, d)
        .select(col("vec_id").as("offset_id"), col("embedding"))
      val root = graft.sources.CollectionStore.indexRoot(d)
      val model = graft.sources.CollectionStore.ivfServing(
        vecs, root, nCentroids = 16, nReplica = 4)
      val codes = graft.sources.CollectionStore.rotatedCodesServing(
        vecs, root, dim = 64)
      val queries = graft.Tables.embeddings(s, d).filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      vecCollection(s, d)
        .queryAnnQuantized(model, codes, queries, k = 5, nprobe = 8, dim = 64)
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // PRE-filtered ANN through the facade (filter-first, knn_filter.rs):
    // the Where's allowed set semi-joins the probed postings before
    // scoring, so every query still returns k survivors, all satisfying
    // the filter. Approximate (rows-only); k-completeness + allowed-only
    // + recall are gated in IvfSpec.
    "fc_ann_filtered" -> { (s, d) =>
      val model = graft.sources.CollectionStore.ivfServing(
        graft.Tables.embeddings(s, d)
          .select(col("vec_id").as("offset_id"), col("embedding")),
        graft.sources.CollectionStore.indexRoot(d), nCentroids = 16, nReplica = 4)
      val queries = graft.Tables.embeddings(s, d).filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      val where = WhereParser.parse("""{"even": {"$eq": true}}""")
      vecCollection(s, d)
        .queryAnn(model, queries, k = 5, nprobe = 8, where = Some(where))
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // ===== Exhaustive-mode oracle twins (facade paths) =====
    // Same serving code as the fc_ann_* queries above with the
    // approximation knob at the exhaustive end (nprobe == nCentroids,
    // α·k ≥ N), so the result is provably the brute-force KNN and the
    // row hash-matches the exact oracle — the fc_ann_tail trick
    // generalized to every facade family (invariants.py:277-438's dual
    // exact/recall modes).

    "fc_ann_query_oracle" -> { (s, d) =>
      val model = graft.sources.CollectionStore.ivfServing(
        graft.Tables.embeddings(s, d)
          .select(col("vec_id").as("offset_id"), col("embedding")),
        graft.sources.CollectionStore.indexRoot(d), nCentroids = 16, nReplica = 4)
      vecCollection(s, d)
        .queryAnn(model, queryVecs(s, d, 3), k = 5, nprobe = 16)
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Pre-filtered ANN, exhaustive probes: the allowed-set semi-join
    // composes with a now-exact index leg → exact filtered KNN.
    "fc_ann_filtered_oracle" -> { (s, d) =>
      val model = graft.sources.CollectionStore.ivfServing(
        graft.Tables.embeddings(s, d)
          .select(col("vec_id").as("offset_id"), col("embedding")),
        graft.sources.CollectionStore.indexRoot(d), nCentroids = 16, nReplica = 4)
      val where = WhereParser.parse("""{"even": {"$eq": true}}""")
      vecCollection(s, d)
        .queryAnn(model, queryVecs(s, d, 3), k = 5, nprobe = 16,
          where = Some(where))
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Quantized-SPANN composition, both approximations exhausted:
    // nprobe == nCentroids (probe everything) AND α·k ≥ N (the coarse
    // code rank drops nobody) → the exact re-rank is brute force.
    "fc_ann_quantized_oracle" -> { (s, d) =>
      val vecs = graft.Tables.embeddings(s, d)
        .select(col("vec_id").as("offset_id"), col("embedding"))
      val root = graft.sources.CollectionStore.indexRoot(d)
      val model = graft.sources.CollectionStore.ivfServing(
        vecs, root, nCentroids = 16, nReplica = 4)
      val codes = graft.sources.CollectionStore.rotatedCodesServing(
        vecs, root, dim = 64)
      vecCollection(s, d)
        .queryAnnQuantized(model, codes, queryVecs(s, d, 3), k = 5,
          nprobe = 16, dim = 64, alpha = 400)
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // IndexAndWal — the reference's DEFAULT read level
    // (plan.rs:553-565): compact part of the corpus, build the served
    // IVF over it, then ADD the rest through the WAL and query WITHOUT
    // re-compacting. The served leg answers from the index, the KnnLog
    // leg brute-forces the un-compacted tail, KnnMerge keeps the k best.
    // nprobe == nCentroids makes the index leg exhaustive, so the merged
    // result is EXACTLY the brute-force KNN over the full corpus —
    // hash-checked against the oracle (the approximate-nprobe tail path
    // is gated in ClientSpec). The query vectors are tail records: every
    // top-1 hit is a record the index has never seen.
    // CONFIG-DRIVEN served ANN (r9): the collection DECLARES a SPANN
    // vector-index config (collection_configuration.rs) and queryAnn
    // passes no knobs at all — search_nprobe / replica / space resolve
    // from the descriptor, and the serving index is the split/merge-
    // maintained one with the config's thresholds. The declared
    // search_nprobe (the reference's default 64) exceeds the list
    // count, so the served answer is provably exhaustive and the row
    // hash-matches the exact oracle.
    "fc_ann_config" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/cfg_client"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("vecs",
        graft.sources.Catalog.Schema(vectorIndex = Some(
          graft.sources.Catalog.SpannIndexConfig(space = "cosine",
            nReplica = 4, splitThreshold = 2000))))
      if (!graft.sources.CollectionStore.hasRecords(coll.ref.dataRoot)) {
        coll.add(Tables.embeddings(s, d).select(
          concat(lit("vec-"), col("vec_id")).as("id"), col("embedding")))
        coll.persist()
      }
      client.getCollection("vecs")
        .queryAnn(queryVecs(s, d, 3), k = 5) // every knob from the config
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // the HNSW-config sibling of fc_ann_config: the DECLARED config
    // carries ef_search >= N (exhaustive graph walk) and the space, the
    // call passes nothing — provably exact, hash-matches the oracle.
    "fc_ann_config_hnsw" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/cfg_client_h"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("vecs",
        graft.sources.Catalog.Schema(vectorIndex = Some(
          graft.sources.Catalog.HnswIndexConfig(space = "cosine",
            efSearch = 1000000))))
      if (!graft.sources.CollectionStore.hasRecords(coll.ref.dataRoot)) {
        coll.add(Tables.embeddings(s, d).select(
          concat(lit("vec-"), col("vec_id")).as("id"), col("embedding")))
        coll.persist()
      }
      client.getCollection("vecs")
        .queryAnnHnsw(queryVecs(s, d, 3), k = 5) // ef + space from config
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // MULTI-BIT quantized serving through the client, WITH an
    // un-compacted WAL tail (`rust/index/src/quantization/multi_bit.rs`
    // — the operating point for cross-cluster corpora where 1-bit sign
    // codes invert against the exact scan; the gauntlet's hard cell).
    // nprobe covers every list and α·k the whole corpus, so the
    // coarse-rank → exact-rerank → KnnLog tail merge is provably exact
    // and hash-matches the brute-force oracle; realistic (non-covering)
    // operating points are recall-gated in QuantizedSpec and measured
    // in ANN_GAUNTLET.json.
    "fc_ann_quantized_mb" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/mb_client"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("vecs")
      def recs(pred: org.apache.spark.sql.Column) =
        Tables.embeddings(s, d).filter(pred).select(
          concat(lit("vec-"), col("vec_id")).as("id"), col("embedding"))
      if (!graft.sources.CollectionStore.hasRecords(coll.ref.dataRoot)) {
        coll.add(recs(col("vec_id") >= 100))
        coll.persist()
      }
      coll.add(recs(col("vec_id") < 100)) // the un-compacted tail
      coll.queryAnnQuantizedMb(queryVecs(s, d, 3), k = 5, nprobe = 16,
          bits = 4, alpha = 400, nCentroids = 16, nReplica = 4)
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    "fc_ann_tail" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/tail_client"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("vecs")
      def recs(pred: org.apache.spark.sql.Column) =
        Tables.embeddings(s, d).filter(pred).select(
          concat(lit("vec-"), col("vec_id")).as("id"), col("embedding"))
      // compaction runs once (the compactor's cadence, not the query's):
      // a later run reopens the persisted segment + its IVF marker and
      // measures the served path — route + probe + tail merge
      if (!graft.sources.CollectionStore.hasRecords(coll.ref.dataRoot)) {
        coll.add(recs(col("vec_id") >= 100))
        coll.persist()
      }
      coll.add(recs(col("vec_id") < 100)) // the un-compacted tail
      coll.queryAnn(queryVecs(s, d, 3), k = 5, nprobe = 16,
          nCentroids = 16, nReplica = 4)
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // IndexAndWal through the HNSW-served facade path — the reference's
    // compacted vector segment IS an HNSW (distributed_hnsw.rs); the
    // tail leg and shadowing are the same merge as fc_ann_tail.
    // Approximate (graph search) → rows-only; tail semantics + recall
    // gated in ClientAnnTailSpec/HnswSpec.
    "fc_ann_hnsw_tail" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/tail_client_h"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("vecs")
      def recs(pred: org.apache.spark.sql.Column) =
        Tables.embeddings(s, d).filter(pred).select(
          concat(lit("vec-"), col("vec_id")).as("id"), col("embedding"))
      if (!graft.sources.CollectionStore.hasRecords(coll.ref.dataRoot)) {
        coll.add(recs(col("vec_id") >= 100))
        coll.persist()
      }
      coll.add(recs(col("vec_id") < 100))
      coll.queryAnnHnsw(queryVecs(s, d, 3), k = 5, efSearch = 128)
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // The HNSW tail path exhausted: ef ≥ every partition graph's node
    // count → the index leg is a degenerate-exact full scan, the tail
    // leg is exact by construction, and the shadowed merge equals the
    // brute-force KNN over the whole corpus — hash-exact through the
    // same IndexAndWal code as fc_ann_hnsw_tail.
    "fc_ann_hnsw_tail_oracle" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/tail_client_h"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("vecs")
      def recs(pred: org.apache.spark.sql.Column) =
        Tables.embeddings(s, d).filter(pred).select(
          concat(lit("vec-"), col("vec_id")).as("id"), col("embedding"))
      if (!graft.sources.CollectionStore.hasRecords(coll.ref.dataRoot)) {
        coll.add(recs(col("vec_id") >= 100))
        coll.persist()
      }
      coll.add(recs(col("vec_id") < 100))
      coll.queryAnnHnsw(queryVecs(s, d, 3), k = 5, efSearch = 1000000)
        .select(col("query_id"), col("rank"),
          col("dist").cast("float").as("dist"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },

    // Full client lifecycle end-to-end (chromadb.Client surface):
    // create collection -> batch add -> merge-update -> predicate delete
    // -> paginated filtered get, all through the WAL-semantics handle
    // with read-your-writes. Offsets assign densely by id within the add
    // batch, so the oracle's ORDER BY id pagination is the same order.
    "fc_client_e2e" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_client_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("docs")
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta")))
      coll.update(Tables.documents(s, d).filter(col("doc_id") % 3 === 0).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        lit(null).cast("string").as("document"),
        map(lit("src"), col("source")).as("meta")))
      coll.deleteWhere(WhereParser.parse("""{"lang": {"$eq": "de"}}"""))
      coll.get(
        where = Some(graft.model.Where.DocContains("data", negated = false)),
        limit = Some(200), offset = 10,
        include = Seq("document", "meta:lang", "meta:src"))
    },

    // Chunked ingestion end-to-end — the pre-embedding splitter feeding
    // the store (the reference ecosystem's chunk-then-add contract):
    // documents cut into 64-token windows (TextStats.chunkWindows),
    // each chunk added as its own record with parent/idx/n_tok
    // metadata, then a where_document-filtered get projects chunks
    // back with their lineage.
    "fc_chunk_ingest" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_chunk_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("chunks")
      val chunks = graft.operators.TextStats.chunkWindows(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        chunkSize = 64, overlap = 16)
      coll.add(chunks.select(
        concat(lit("doc-"), col("doc_id"), lit("#"), col("chunk_idx")).as("id"),
        col("chunk").as("document"),
        map(lit("parent"), col("doc_id").cast("string"),
          lit("idx"), col("chunk_idx").cast("string"),
          lit("n_tok"), col("n_tok").cast("string")).as("meta")))
      coll.get(
        where = Some(graft.model.Where.DocContains("merge", negated = false)),
        limit = Some(100),
        include = Seq("document", "meta:parent", "meta:idx"))
    },

    // Per-key inverted-index serving (`collection_schema.rs:696-873`):
    // the collection declares `par` int with its inverted index enabled;
    // the equality get routes through the bucket-partitioned posting
    // table (plan-pruned to the probe's bucket — gated in
    // CollectionConfigSpec) and the full predicate verifies on the view.
    "fc_key_inverted" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_ki_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("ki", graft.sources.Catalog.Schema(
        keys = Map("par" -> graft.sources.Catalog.KeyConfig(
          graft.sources.Catalog.VInt, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("par"), col("doc_id") % 10).as("meta_int")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.Cmp("par", "$eq",
          graft.model.Where.VInt(3))))
        .orderBy(col("id"))
    },

    // $in through the same per-key posting table: each value probes its
    // own bucket (multi-literal static pruning), candidates union, the
    // full predicate verifies — here the string-typed sibling of
    // fc_key_inverted's int path.
    "fc_key_inverted_in" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_kin_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("kin", graft.sources.Catalog.Schema(
        keys = Map("lang" -> graft.sources.Catalog.KeyConfig(
          graft.sources.Catalog.VString, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.SetIn("lang",
          Seq(graft.model.Where.VStr("en"), graft.model.Where.VStr("fr")),
          negated = false)),
        include = Seq("document", "meta:lang"))
        .orderBy(col("id"))
    },

    // Array metadata $contains served from the SAME per-key posting
    // family (the reference's ContainsOperator through the inverted
    // lists, `rust/types/src/metadata.rs:2169`): the declared string[]
    // key indexes one posting row per ELEMENT value, the membership
    // probe prunes to its bucket, the full predicate verifies on the
    // view. Arrays ride the WAL map as tagged JSON (TypedMeta.TagArr).
    "fc_key_arr_contains" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_kac_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("kac", graft.sources.Catalog.Schema(
        keys = Map("tags" -> graft.sources.Catalog.KeyConfig(
          graft.sources.Catalog.VStringArray, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("tags"), array(col("lang"), col("source"),
          concat(lit("tag"), col("doc_id") % 7))).as("meta_str_arr")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.ArrContains("tags",
          graft.model.Where.VStr("tag3"), negated = false)))
        .orderBy(col("id"))
    },

    // The int-array sibling (`MetadataValue::IntArray`,
    // `rust/types/src/metadata.rs:348`): elements ride the WAL as
    // tagged JSON, shred to `meta_int_arr`, and index one posting row
    // per element under the promoted-double canonical term — the probe
    // for VInt(4) and the scan's array<double> contains can never
    // disagree on representation.
    "fc_key_arr_contains_int" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_kaci_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("kaci", graft.sources.Catalog.Schema(
        keys = Map("nums" -> graft.sources.Catalog.KeyConfig(
          graft.sources.Catalog.VIntArray, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("nums"), array(col("doc_id") % 7, col("doc_id") % 11,
          lit(1000L) + col("doc_id") % 3)).as("meta_int_arr")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.ArrContains("nums",
          graft.model.Where.VInt(4), negated = false)))
        .orderBy(col("id"))
    },

    // The reference GetRequest's THREE separate filter fields — ids,
    // where, where_document (`rust/types/src/api_types.rs` GetRequest) —
    // conjoin at plan time: the id list prefilters via the segment's
    // bloomed id scan, the metadata eq via its posting table, and the
    // doc-contains verifies on the joined view. where_document is
    // validated doc-leaves-only, the reference's WhereDocument contract.
    "fc_get_ids_doc" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_gid_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("gid", graft.sources.Catalog.Schema(
        keys = Map("lang" -> graft.sources.Catalog.KeyConfig(
          graft.sources.Catalog.VString, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta")))
      coll.persist()
      coll.get(
        ids = Some((0 to 400 by 3).map(i => s"doc-$i")),
        where = Some(graft.model.Where.Cmp("lang", "$eq",
          graft.model.Where.VStr("en"))),
        whereDocument = Some(graft.model.Where.DocContains("data",
          negated = false)),
        include = Seq("document", "meta:lang"))
        .orderBy(col("id"))
    },

    // The wire face's answer to unbounded get (r13): walk the FILTERED
    // ordered export page by page through CollectionHandle.getPage —
    // each page is one quota-sized slice of the offset_id order, from
    // the one-pass range-partition + local-sort + cursor plan (never a
    // global sort, never an unbounded driver collect). Three pages
    // concatenated must hash-match the oracle's row_number paging.
    "fc_get_page" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_page_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("pgd")
      // one ordered input partition → offset ids follow doc_id order
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta"))
        .orderBy(col("id")).coalesce(1))
      val where = Some(graft.model.Where.Cmp("lang", "$eq",
        graft.model.Where.VStr("en")))
      (0L to 2L).map(p =>
          coll.getPage(64, p, where, include = Seq("document", "meta:lang"))
            .withColumn("page", lit(p)))
        .reduce(_ unionByName _)
        .orderBy(col("page"), col("id"))
    },

    // Bitmap ∧ through the posting family: BOTH conjunctive eq leaves
    // probe their posting tables and the candidate sets intersect
    // before the verify pass — the reference merges per-leaf posting
    // bitmaps with And before touching records. Two point lookups,
    // never a corpus scan.
    "fc_key_inverted_and" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_kia_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("kia", graft.sources.Catalog.Schema(
        keys = Map(
          "lang" -> graft.sources.Catalog.KeyConfig(
            graft.sources.Catalog.VString, invertedIndex = Some(true)),
          "src" -> graft.sources.Catalog.KeyConfig(
            graft.sources.Catalog.VString, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang"), lit("src"), col("source")).as("meta")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.And(Seq(
          graft.model.Where.Cmp("lang", "$eq", graft.model.Where.VStr("en")),
          graft.model.Where.Cmp("src", "$eq", graft.model.Where.VStr("src3"))))),
        include = Seq("document", "meta:lang", "meta:src"))
        .orderBy(col("id"))
    },

    // Bitmap ∨: a $or whose branches are BOTH indexable eq leaves on
    // different keys unions the branch probes (exactly the rows
    // matching either branch — a superset of the Or's matches, so the
    // narrow-only contract holds); the full predicate still verifies.
    "fc_key_inverted_cross_or" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_kio_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("kio", graft.sources.Catalog.Schema(
        keys = Map(
          "lang" -> graft.sources.Catalog.KeyConfig(
            graft.sources.Catalog.VString, invertedIndex = Some(true)),
          "src" -> graft.sources.Catalog.KeyConfig(
            graft.sources.Catalog.VString, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang"), lit("src"), col("source")).as("meta")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.Or(Seq(
          graft.model.Where.Cmp("lang", "$eq", graft.model.Where.VStr("fr")),
          graft.model.Where.SetIn("src",
            Seq(graft.model.Where.VStr("src5"), graft.model.Where.VStr("src7")),
            negated = false)))),
        include = Seq("document", "meta:lang", "meta:src"))
        .orderBy(col("id"))
    },

    // The FULL recursive bitmap algebra (the reference's RoaringBitmap
    // And/Or evaluation over per-leaf posting bitmaps): a $or of two
    // nested $ands, one carrying a RANGE leaf — every leg routes
    // (hash-bucketed eq probes, value-ordered range probe), branch
    // intersections union, the full predicate verifies on the view.
    "fc_key_bool_nested" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_kbn_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("kbn", graft.sources.Catalog.Schema(
        keys = Map(
          "lang" -> graft.sources.Catalog.KeyConfig(
            graft.sources.Catalog.VString, invertedIndex = Some(true)),
          "src" -> graft.sources.Catalog.KeyConfig(
            graft.sources.Catalog.VString, invertedIndex = Some(true)),
          "par" -> graft.sources.Catalog.KeyConfig(
            graft.sources.Catalog.VInt, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang"), lit("src"), col("source")).as("meta"),
        map(lit("par"), col("doc_id") % 100).as("meta_int")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.Or(Seq(
          graft.model.Where.And(Seq(
            graft.model.Where.Cmp("lang", "$eq", graft.model.Where.VStr("en")),
            graft.model.Where.Cmp("par", "$gte", graft.model.Where.VInt(80)))),
          graft.model.Where.And(Seq(
            graft.model.Where.Cmp("lang", "$eq", graft.model.Where.VStr("fr")),
            graft.model.Where.SetIn("src",
              Seq(graft.model.Where.VStr("src5"), graft.model.Where.VStr("src7")),
              negated = false)))))),
        include = Seq("document", "meta:lang", "meta:src"))
        .orderBy(col("id"))
    },

    // Cross-domain bitmap ∨: a $or whose branches live in DIFFERENT
    // index families — a doc-$contains branch served from the trigram
    // FTS candidates, a metadata-eq branch from the key's posting table
    // (the reference unions its FTS bitmap with metadata bitmaps in the
    // same expression tree). Either source alone would miss rows; the
    // union is a superset of the Or's matches and the predicate
    // verifies.
    "fc_key_or_doc_meta" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_kodm_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("kodm", graft.sources.Catalog.Schema(
        documentFts = true,
        keys = Map("lang" -> graft.sources.Catalog.KeyConfig(
          graft.sources.Catalog.VString, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.Or(Seq(
          graft.model.Where.DocContains("merge", negated = false),
          graft.model.Where.Cmp("lang", "$eq", graft.model.Where.VStr("fr"))))),
        include = Seq("document", "meta:lang"))
        .orderBy(col("id"))
    },

    // Range predicates served from the VALUE-ORDERED posting layout
    // (the reference's sorted typed keys range-scan,
    // `rust/index/src/metadata/types.rs:580-676`): both conjunctive
    // leaves of the int key fold into one bounds-pruned probe (the plan
    // reads only the range's rbucket directories — gated in
    // CollectionConfigSpec); the full predicate verifies on the view.
    "fc_key_range" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_kr_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("kr", graft.sources.Catalog.Schema(
        keys = Map("par" -> graft.sources.Catalog.KeyConfig(
          graft.sources.Catalog.VInt, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("par"), col("doc_id") % 100).as("meta_int")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.And(Seq(
          graft.model.Where.Cmp("par", "$gte", graft.model.Where.VInt(17)),
          graft.model.Where.Cmp("par", "$lt", graft.model.Where.VInt(42))))))
        .orderBy(col("id"))
    },

    // The string sibling: lexicographic range over a declared string key
    // through the same value-ordered postings (bucket bounds compare
    // UTF-8 bytes — Spark's string order — so pruning can never disagree
    // with the scan predicate).
    "fc_key_range_str" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_krs_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("krs", graft.sources.Catalog.Schema(
        keys = Map("lang" -> graft.sources.Catalog.KeyConfig(
          graft.sources.Catalog.VString, invertedIndex = Some(true)))))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta")))
      coll.persist()
      coll.get(where = Some(graft.model.Where.And(Seq(
          graft.model.Where.Cmp("lang", "$gte", graft.model.Where.VStr("en")),
          graft.model.Where.Cmp("lang", "$lte", graft.model.Where.VStr("fr")))))
        , include = Seq("document", "meta:lang"))
        .orderBy(col("id"))
    },

    // indexing_status (`service_based_frontend.rs:2738-2772`,
    // `IndexStatusResponse` api_types.rs:1101): doc_id<50 compacts
    // (indexed), 50..74 commits to the log after the compaction
    // (unindexed) — the op-count split reads from the O(1) entry
    // markers alone.
    "fc_indexing_status" -> { (s, d) =>
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_ixs_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("ixs")
      val docs = Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"), col("doc_id"))
      coll.add(docs.filter(col("doc_id") < 50).select("id", "document"))
      coll.commitLog() // entry 1
      coll.persist()   // walmark covers entry 1
      coll.add(docs.filter(col("doc_id") >= 50 && col("doc_id") < 75)
        .select("id", "document"))
      coll.commitLog() // entry 2 — past the mark
      val st = coll.indexingStatus()
      Seq((BigDecimal(st.opIndexingProgress).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          st.numUnindexedOps, st.numIndexedOps, st.totalOps))
        .toDF("progress", "unindexed_ops", "indexed_ops", "total_ops")
    },

    // ReadLevel surface parity (`plan.rs:550-565`): the same collection
    // read at IndexOnly (compacted segment alone — the un-compacted
    // tail invisible), IndexAndBoundedWal(1) (segment + exactly the
    // first tail entry), and IndexAndWal (full read-your-writes). Evens
    // compact; odds arrive as tail entry 1; an EDITED update to every
    // doc_id%4 lands as entry 2 — visible only at IndexAndWal.
    "fc_read_levels" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_rl_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("rl")
      val docs = Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"), col("doc_id"))
      coll.add(docs.filter(col("doc_id") % 2 === 0).select("id", "document"))
      coll.persist()
      coll.add(docs.filter(col("doc_id") % 2 === 1).select("id", "document"))
      coll.update(docs.filter(col("doc_id") % 4 === 0)
        .select(col("id"), lit("EDITED").as("document")))
      Seq(
        ("index_only", graft.api.ReadLevel.IndexOnly),
        ("bounded_1", graft.api.ReadLevel.IndexAndBoundedWal(1)),
        ("index_and_wal", graft.api.ReadLevel.IndexAndWal))
        .map { case (nm, lvl) => coll.get(readLevel = lvl)
          .select(lit(nm).as("level"), col("id"), col("document")) }
        .reduce(_ unionAll _)
        .orderBy(col("level"), col("id"))
    },

    // The record's `uri` field through the full write path — the
    // reference's blob-pointer contract (Collection.py:96-109 uris
    // surface): add() accepts a uri column, it rides the WAL, an Update
    // carrying ONLY a new uri replaces it while document and metadata
    // survive the merge, and `include=["uri"]` projects it back out.
    "fc_uri_roundtrip" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_uri_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("uri_docs")
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        concat(lit("s3://corpus/"), col("source"), lit("/"), col("doc_id"))
          .as("uri"),
        map(lit("lang"), col("lang")).as("meta")))
      // blob migration: every third record's uri moves to cold storage —
      // document and lang must survive the uri-only update
      coll.update(Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
        .select(
          concat(lit("doc-"), col("doc_id")).as("id"),
          concat(lit("s3://cold/"), col("doc_id")).as("uri")))
      coll.get(
        where = Some(WhereParser.parse("""{"lang": {"$eq": "en"}}""")),
        limit = Some(100), include = Seq("document", "uri", "meta:lang"))
    },

    // Attached server-side functions through the client: the schema
    // DECLARES them (resolution fails at registration, the reference's
    // register-by-name contract, service_based_frontend.rs:3208-3460),
    // runAttached executes over the live read-your-writes state. Both
    // registered families exercised — the lang histogram and the global
    // top-10 token stats — union'd into one deterministic table.
    "fc_attached_stats" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_attached_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("stats_docs",
        graft.sources.Catalog.Schema(
          attached = Seq("meta_histogram:lang", "token_stats_10")))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta")))
      val hist = coll.runAttached("meta_histogram:lang")
        .select(lit("lang_histogram").as("stat"), col("value").as("term"),
          col("n").as("cnt"))
      val toks = coll.runAttached("token_stats_10")
        .select(lit("top_tokens").as("stat"), col("term"), col("cnt"))
      hist.unionByName(toks).orderBy(col("stat"), desc("cnt"), col("term"))
    },

    // The FULL attach_function lifecycle through the client — the
    // reference's AttachFunctionRequest (`api_types.rs:2651`,
    // `service_based_frontend.rs:3208`): attach creates the instance
    // AND its dedicated output collection, the backfill invocation
    // populates it from the input's durable state, and a later
    // delete + invoke refreshes it (the emptied 'fr' bucket is
    // tombstoned, not left stale). The query reads the OUTPUT
    // COLLECTION's records — id = histogram value, count in meta_int.
    "fc_fn_lifecycle" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_fnlc_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("fn_docs")
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta")))
      coll.persist()
      client.attachFunction("fn_docs", "lang_hist",
        "meta_histogram:lang", "fn_docs_hist")
      import graft.model.Where
      coll.deleteWhere(Where.Cmp("lang", "$eq", Where.VStr("fr")))
      coll.commitLog()
      client.invokeAttachedFunction("fn_docs", "lang_hist")
      client.getCollection("fn_docs_hist").asCollection.records
        .select(col("id").as("value"),
          element_at(col("meta_int"), "n").as("n"))
        .orderBy(col("value"))
    },

    // The reference's `statistics` attached function end-to-end
    // (statistics.rs): per-(key, typed value) frequency counts over
    // str/int/bool metadata plus the summary::s:total_count row, in the
    // reference's EXACT output-record shape — id `<key>::<pfx>:<value>`,
    // the `statistics about …` document, {count, key, type, value}
    // metadata — attached, backfilled, and read back from the output
    // collection.
    "fc_fn_statistics" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_fnst_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("stat_docs")
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta"),
        map(lit("n_mod"), col("n_chars") % 5).as("meta_int"),
        map(lit("flag"), col("doc_id") % 2 === 0).as("meta_bool")))
      coll.persist()
      client.attachFunction("stat_docs", "stats", "statistics",
        "stat_docs_stats")
      client.getCollection("stat_docs_stats").asCollection.records
        .select(col("id"), col("document"),
          element_at(col("meta_int"), "count").as("count"),
          element_at(col("meta_str"), "key").as("key"),
          element_at(col("meta_str"), "type").as("type"),
          element_at(col("meta_str"), "value").as("value"))
        .orderBy(col("id"))
    },

    // The reference's `revision_history` attached function
    // (revision_history.rs): every durable mutation becomes an
    // immutable `{id}::v{n}` revision record in the output collection —
    // adds v1, upserts v2, deletes tombstone revisions with
    // `is_delete: true` and no document — plus the `::v0` tracker rows
    // carrying the monotonic version counter. Two log entries, two
    // invocations (backfill + catch-up); the catch-up resumes from the
    // tracker state the first run left in the output.
    "fc_fn_revisions" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_fnrv_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("rv")
      val docs = Tables.documents(s, d).filter(col("doc_id") < 60)
      coll.add(docs.select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document")))
      coll.commitLog() // entry 1: v1 for every record
      client.attachFunction("rv", "hist", "revision_history", "rv_hist")
      coll.upsert(docs.filter(col("doc_id") % 4 === 0).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        concat(col("text"), lit(" v2")).as("document")))
      coll.delete((0 until 60 by 9).map(i => s"doc-$i"))
      coll.commitLog() // entry 2: upserts then tombstones
      client.invokeAttachedFunction("rv", "hist")
      // tracker rows have no version/is_delete — coalesce to sentinels
      // on BOTH sides (a NULL boolean round-trips as NaN through the
      // oracle's pandas compare)
      client.getCollection("rv_hist").asCollection.records
        .select(col("id"), col("document"),
          element_at(col("meta_str"), "original_id").as("original_id"),
          coalesce(element_at(col("meta_int"), "version"), lit(0L))
            .as("version"),
          coalesce(element_at(col("meta_bool"), "is_delete"), lit(false))
            .as("is_delete"))
        .orderBy(col("id"))
    },

    // The NB quality classifier bound to a collection as a server-side
    // attached function (the register-by-name contract): the schema
    // declares nb_quality:lang=en, the executor fits on the LIVE records
    // (curated = lang:en metadata) and scores every record.
    "fc_nb_attached" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_nbatt_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("nb_docs",
        graft.sources.Catalog.Schema(attached = Seq("nb_quality:lang=en")))
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        col("text").as("document"),
        map(lit("lang"), col("lang")).as("meta")))
      coll.runAttached("nb_quality:lang=en").orderBy(col("doc_id"))
    },

    // Sparse KNN through the facade: tf_bow sparse column, where-filtered
    // (filter-before-KNN), plain tf weights — integer-valued f32 sums are
    // exact, so the oracle hash-matches.
    "fc_sparse_search" -> { (s, d) =>
      val where = WhereParser.parse("""{"lang": {"$eq": "en"}}""")
      val qv = s.range(1).select(
        array_sort(array(sparseTerms.map(t => xxhash64(lit(t))): _*)).as("qi"),
        array(sparseTerms.map(_ => lit(1.0f)): _*).as("qv"))
      docsSparseCollection(s, d)
        .sparseSearch("tf_bow", qv, k = 20, where = Some(where))
        .select(col("id"), col("#score").cast("float").as("score"))
    },

    // Per-key sparse index config at the CLIENT handle: the declared
    // sparse key with `indexed = true` serves this search from the
    // persisted Block-Max posting index (sparse_vector_index,
    // collection_schema.rs:745-873) — bucket-pruned posting read +
    // MaxScore, exact. Ids zero-pad so the engine's offset-order tie
    // break at the k boundary equals the oracle's numeric doc_id order.
    "fc_sparse_cfg_served" -> { (s, d) =>
      sparseClientCollection(s, d, "scs", indexed = true)
        .sparseSearch("tf_bow",
          sparseTermIds(s).map(_ -> 1.0f), k = 20)
        .select(col("id"), col("#score").cast("float").as("score"))
        .orderBy(desc("score"), col("id"))
    },

    // The scan twin: `indexed = false` takes the in-plan meta_sparse
    // scan — identical results (both paths are exact), different plan
    // (no posting read — plan-gated in CollectionConfigSpec).
    "fc_sparse_cfg_scan" -> { (s, d) =>
      sparseClientCollection(s, d, "scn", indexed = false)
        .sparseSearch("tf_bow",
          sparseTermIds(s).map(_ -> 1.0f), k = 20)
        .select(col("id"), col("#score").cast("float").as("score"))
        .orderBy(desc("score"), col("id"))
    },

    // Sparse $knn leaf through the WIRE payload (QueryVector::Sparse +
    // Key::field, operator.rs:843-866): the JSON object query routes to
    // the per-key meta_sparse column, scored by the codegen'd sparse dot,
    // fused through the same rank pipeline as dense leaves. Leaf dist is
    // -dot, so the query projects score = -#score.
    "fc_search_sparse_json" -> { (s, d) =>
      val qIds = s.range(1)
        .select(sparseTerms.map(t => xxhash64(lit(t))): _*).collect()(0)
      val idsJson = sparseTerms.indices.map(qIds.getLong).mkString(", ")
      val valsJson = sparseTerms.map(_ => "1.0").mkString(", ")
      val payload =
        s"""{"rank": {"$$knn": {"query": {"indices": [$idsJson],
           |  "values": [$valsJson]}, "key": "tf_bow", "limit": 20}},
           |"limit": {"limit": 20}}""".stripMargin
      docsSparseCollection(s, d).searchPayload(payload)
        .select(col("id"), (-col("#score")).cast("float").as("score"))
        .orderBy(desc("score"), col("id"))
    },

    // Search payload with a where_document filter routed through the FTS
    // segment (filter.rs's contains→FTS candidate path): the $contains
    // needle prunes the sparse-KNN candidate scan to index candidates
    // BEFORE the predicate verifies — same result as the scan, served.
    "fc_search_doc_filtered" -> { (s, d) =>
      val ftsRoot = graft.sources.CollectionStore.ftsServing(
        graft.Tables.documents(s, d), graft.sources.CollectionStore.indexRoot(d))
      val qIds = s.range(1)
        .select(sparseTerms.map(t => xxhash64(lit(t))): _*).collect()(0)
      val idsJson = sparseTerms.indices.map(qIds.getLong).mkString(", ")
      val valsJson = sparseTerms.map(_ => "1.0").mkString(", ")
      val payload =
        s"""{"filter": {"$$document": {"$$contains": "sort merge"}},
           |"rank": {"$$knn": {"query": {"indices": [$idsJson],
           |  "values": [$valsJson]}, "key": "tf_bow", "limit": 20}},
           |"limit": {"limit": 20}}""".stripMargin
      docsSparseCollection(s, d).searchPayload(payload, ftsRoot = Some(ftsRoot))
        .select(col("id"), (-col("#score")).cast("float").as("score"))
        .orderBy(desc("score"), col("id"))
    },

    // Sparse KNN SERVED from the persisted per-key posting index (the
    // reference's sparse_vector_index at compaction): explode once at
    // build, query-time reads prune to the terms' bucket directories and
    // run Block-Max MaxScore. Exact — hash-matches the same corpus math
    // as the in-plan variant, over all languages.
    "fc_sparse_served" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d)
      graft.sources.CollectionStore.sparseServing(
        docsSparseCollection(s, d).records, "tf_bow", root)
      val qIds = s.range(1)
        .select(sparseTerms.map(t => xxhash64(lit(t))): _*).collect()(0)
      val q = sparseTerms.indices.map(i => qIds.getLong(i) -> 1.0f)
      graft.sources.CollectionStore
        .sparseServedSearch(s, root, "tf_bow", q, k = 20)
        .select(col("doc_id"), concat(lit("doc-"), col("doc_id")).as("id"),
          col("score").cast("float").as("score"))
        .orderBy(desc("score"), col("doc_id"))
    },

    // Same, with BM25-IDF-scaled query weights computed IN-PLAN from
    // corpus document frequencies (the reference's Idf operator feeding
    // sparse KNN). Weights quantize to 1/64 steps so every product and
    // the <=4-term sum are exactly representable in f32 — bit-identical
    // to the DuckDB oracle's double arithmetic.
    "fc_sparse_idf" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("n"))
      // shared lineage feeds both the per-record sparse column and the
      // document-frequency stats (re-computed, not cached: the codegen'd
      // tokenize is cheaper than materializing 1.5M tf rows)
      val tf = docsTf(s, d)
      val termIds = s.range(1).select(explode(array(
        sparseTerms.map(t => xxhash64(lit(t))): _*)).as("term_id"))
      val df = tf
        .join(broadcast(termIds), "term_id")
        .groupBy("term_id").agg(count(lit(1)).as("df"))
      val qv = df.crossJoin(broadcast(n))
        .withColumn("w",
          (floor(log((col("n").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
            * 64.0) / 64.0).cast("float"))
        .agg(sort_array(collect_list(struct(col("term_id"), col("w")))).as("p"))
        .select(col("p.term_id").as("qi"), col("p.w").as("qv"))
      docsSparseCollection(s, d, Some(tf))
        .sparseSearch("tf_bow", qv, k = 20)
        .select(col("id"), col("#score").cast("float").as("score"))
    },
    // Sparse search over a FITTED SPLADE-style embedding function
    // (LogTfIdfSparse): the idf vocabulary fits in one corpus
    // aggregation (top-2048 terms by df — deterministic, so the oracle
    // reproduces the exact vocabulary), doc weights are
    // ln(1+tf)·idf quantized to 1/1024 — f32 dot bit-identical to the
    // double-computing oracle.
    "fc_sparse_splade" -> { (s, d) =>
      val ef = graft.functions.EmbeddingFunctions.LogTfIdfSparse.fit(
        Tables.documents(s, d), "text", maxVocab = 2048)
      val base = ChromaCore.docsCollection(s, d).records
      val coll = new Collection(graft.functions.EmbeddingFunctions.attachOnce(
        base, "meta_sparse", map(lit("splade"), ef.embedSparse(col("document")))))
      val qv = s.range(1).select(
        array_sort(array(sparseTerms.map(t => xxhash64(lit(t))): _*)).as("qi"),
        array(sparseTerms.map(_ => lit(1.0f)): _*).as("qv"))
      coll.sparseSearch("splade", qv, k = 20)
        .select(col("id"), col("#score").cast("float").as("score"))
    },

    // Sparse search where the record column comes from the Bm25Sparse
    // EMBEDDING FUNCTION (doc-side BM25 saturation, 1/1024-quantized →
    // f32 dot bit-identical to the double-computing oracle).
    "fc_sparse_bm25ef" -> { (s, d) =>
      val ef = new graft.functions.EmbeddingFunctions.Bm25Sparse()
      val base = ChromaCore.docsCollection(s, d).records
      val coll = new Collection(graft.functions.EmbeddingFunctions.attachOnce(
        base, "meta_sparse", map(lit("bm25"), ef.embedSparse(col("document")))))
      val qv = s.range(1).select(
        array_sort(array(sparseTerms.map(t => xxhash64(lit(t))): _*)).as("qi"),
        array(sparseTerms.map(_ => lit(1.0f)): _*).as("qv"))
      coll.sparseSearch("bm25", qv, k = 20)
        .select(col("id"), col("#score").cast("float").as("score"))
    },

    // DENSE fitted tf-idf embedding function end-to-end: fit the
    // top-64 vocabulary on the corpus (df desc, term asc — slot order
    // an oracle reproduces with row_number), embed every document, emit
    // the nonzero (slot, weight) cells. Hash-exact because idf
    // quantizes to 1/64, weights to 1/1024, and the L2 norm's
    // sum-of-squares over 10-fractional-bit dyadics is EXACT in double
    // — the only dense embedding output the DuckDB oracle can rebuild
    // bit-for-bit.
    "fc_dense_tfidf" -> { (s, d) =>
      val ef = graft.functions.EmbeddingFunctions.VocabTfIdfDense.fit(
        Tables.documents(s, d), "text", dim = 64)
      Tables.documents(s, d)
        .select(concat(lit("doc-"), col("doc_id")).as("id"),
          ef.embed(col("text")).as("emb"))
        .select(col("id"), posexplode(col("emb")).as(Seq("slot", "w")))
        .filter(col("w") =!= 0f)
        .orderBy(col("id"), col("slot"))
    },
  )

  /** Brute-force cosine top-5 for the 3 facade query vectors — the
    * shared oracle of fc_ann_tail and every facade exhaustive-mode twin
    * (their index legs degenerate to exactly this).
    */
  private lazy val facadeExactK5Sql =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
      |           FROM embeddings WHERE vec_id < 3),
      |d AS (SELECT query_id, 'vec-'||vec_id AS id,
      |        1.0 - list_cosine_similarity(embedding, qe) AS dist
      |      FROM embeddings, q),
      |r AS (SELECT query_id, id, dist,
      |        row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rank
      |      FROM d)
      |SELECT query_id, rank, dist, id FROM r WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  val oracle: Map[String, String] = Map(
    // the tf-idf vec CTE verbatim + a query vector built in SQL from the
    // literal text the payload carries (tf=1 per term, same 1/1024
    // quantization and double normalization as the kernel)
    "fc_search_text" ->
      s"""WITH ${TextAnalysis.tfidfVecsCte},
         |qw AS (SELECT i.slot, floor(ln(2.0) * i.idf * 1024) / 1024 AS w
         |       FROM idf i WHERE i.term IN ('spark', 'data', 'query')),
         |qn AS (SELECT sqrt(sum(w * w)) AS nn FROM qw),
         |qvec AS (SELECT list(coalesce(CAST(qw.w / (SELECT nn FROM qn) AS FLOAT),
         |                     CAST(0 AS FLOAT)) ORDER BY s.slot) AS qe
         |         FROM slots s LEFT JOIN qw ON qw.slot = s.slot)
         |SELECT 'doc-'||v.doc_id AS id,
         |  CAST(1.0 - list_cosine_similarity(v.emb, (SELECT qe FROM qvec))
         |    AS FLOAT) AS score
         |FROM vecs v
         |ORDER BY score, v.doc_id LIMIT 10""".stripMargin,

    "fc_ann_query_oracle" -> facadeExactK5Sql,
    "fc_ann_quantized_oracle" -> facadeExactK5Sql,
    "fc_ann_quantized_mb" -> facadeExactK5Sql,
    "fc_ann_hnsw_tail_oracle" -> facadeExactK5Sql,

    // exact filtered KNN: the even key exists iff vec_id % 3 != 0 and
    // holds vec_id % 2 = 0 (missing-key two-valued semantics)
    "fc_ann_filtered_oracle" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 3),
        |cand AS (SELECT * FROM embeddings
        |         WHERE vec_id % 3 <> 0 AND vec_id % 2 = 0),
        |d AS (SELECT query_id, 'vec-'||vec_id AS id,
        |        1.0 - list_cosine_similarity(embedding, qe) AS dist
        |      FROM cand, q),
        |r AS (SELECT query_id, id, dist,
        |        row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rank
        |      FROM d)
        |SELECT query_id, rank, dist, id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "fc_query_filtered" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 3),
        |cand AS (SELECT * FROM embeddings
        |         WHERE label <> 3 AND vec_id % 3 <> 0 AND vec_id % 2 = 0),
        |d AS (SELECT query_id, vec_id,
        |        1.0 - list_cosine_similarity(embedding, qe) AS dist
        |      FROM cand, q),
        |r AS (SELECT query_id, vec_id, dist,
        |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
        |      FROM d)
        |SELECT query_id, rank, dist, 'vec-'||vec_id AS id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "fc_query_bool_nested" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 3),
        |cand AS (SELECT * FROM embeddings
        |         WHERE vec_id % 3 <> 0 AND (
        |           (label = 1 AND vec_id % 2 = 0) OR
        |           (label = 2 AND vec_id % 2 <> 0))),
        |d AS (SELECT query_id, vec_id,
        |        1.0 - list_cosine_similarity(embedding, qe) AS dist
        |      FROM cand, q),
        |r AS (SELECT query_id, vec_id, dist,
        |        row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
        |      FROM d)
        |SELECT query_id, rank, dist, 'vec-'||vec_id AS id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "fc_query_request_fields" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 3),
        |cand AS (SELECT d.doc_id, e.embedding
        |         FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |         WHERE d.doc_id % 2 = 0 AND e.label <> 3
        |           AND d.text LIKE '%data%'),
        |dd AS (SELECT query_id, doc_id,
        |         1.0 - list_cosine_similarity(embedding, qe) AS dist
        |       FROM cand, q),
        |r AS (SELECT query_id, doc_id, dist,
        |        row_number() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rank
        |      FROM dd)
        |SELECT query_id, rank, dist, 'doc-'||doc_id AS id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "fc_ann_tail" -> facadeExactK5Sql,
    "fc_ann_config" -> facadeExactK5Sql,
    "fc_ann_config_hnsw" -> facadeExactK5Sql,

    "fc_uri_roundtrip" ->
      """WITH live AS (
        |  SELECT 'doc-'||doc_id AS id, text AS document,
        |    CASE WHEN doc_id % 3 = 0 THEN 's3://cold/'||doc_id
        |         ELSE 's3://corpus/'||source||'/'||doc_id END AS uri,
        |    lang
        |  FROM documents)
        |SELECT id, document, uri, lang FROM live WHERE lang = 'en'
        |ORDER BY id LIMIT 100""".stripMargin,

    "fc_attached_stats" ->
      """WITH tf AS (SELECT unnest(list_filter(
        |         string_split_regex(lower(text),'[^a-z0-9]+'), x -> x <> '')) AS term
        |       FROM documents),
        |top AS (SELECT 'top_tokens' AS stat, term, count(*) AS cnt
        |        FROM tf GROUP BY term ORDER BY cnt DESC, term LIMIT 10),
        |hist AS (SELECT 'lang_histogram' AS stat, lang AS term, count(*) AS cnt
        |         FROM documents GROUP BY lang)
        |SELECT stat, term, cnt FROM hist
        |UNION ALL SELECT stat, term, cnt FROM top
        |ORDER BY stat, cnt DESC, term""".stripMargin,

    "fc_fn_lifecycle" ->
      """SELECT lang AS value, count(*) AS n FROM documents
        |WHERE lang <> 'fr' GROUP BY lang ORDER BY value""".stripMargin,

    "fc_fn_revisions" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
        |r AS (
        |  SELECT 'doc-'||doc_id||'::v0' AS id,
        |         CAST(NULL AS VARCHAR) AS document,
        |         'doc-'||doc_id AS original_id,
        |         CAST(0 AS BIGINT) AS version,
        |         false AS is_delete
        |  FROM base
        |  UNION ALL
        |  SELECT 'doc-'||doc_id||'::v1', text, 'doc-'||doc_id, 1, false
        |  FROM base
        |  UNION ALL
        |  SELECT 'doc-'||doc_id||'::v2', text||' v2', 'doc-'||doc_id, 2, false
        |  FROM base WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT 'doc-'||doc_id||'::v'||
        |           (CASE WHEN doc_id % 4 = 0 THEN 3 ELSE 2 END),
        |         NULL, 'doc-'||doc_id,
        |         CASE WHEN doc_id % 4 = 0 THEN 3 ELSE 2 END, true
        |  FROM base WHERE doc_id % 9 = 0)
        |SELECT id, document, original_id,
        |       CAST(version AS BIGINT) AS version, is_delete
        |FROM r ORDER BY id""".stripMargin,

    "fc_fn_statistics" ->
      """WITH s AS (
        |  SELECT 'lang' AS key, 'str' AS type, 's' AS pfx,
        |         lang AS value, count(*) AS count
        |  FROM documents GROUP BY lang
        |  UNION ALL
        |  SELECT 'n_mod', 'int', 'i', CAST(n_chars % 5 AS VARCHAR), count(*)
        |  FROM documents GROUP BY n_chars % 5
        |  UNION ALL
        |  SELECT 'flag', 'bool', 'b',
        |         CASE WHEN doc_id % 2 = 0 THEN 'true' ELSE 'false' END,
        |         count(*)
        |  FROM documents GROUP BY doc_id % 2 = 0
        |  UNION ALL
        |  SELECT 'summary', 'str', 's', 'total_count', count(*)
        |  FROM documents)
        |SELECT key||'::'||pfx||':'||value AS id,
        |       'statistics about '||key||' for '||pfx||':'||value
        |         AS document,
        |       count, key, type, value
        |FROM s ORDER BY id""".stripMargin,

    "fc_key_inverted" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE doc_id%10 = 3 ORDER BY id""".stripMargin,

    "fc_key_inverted_in" ->
      """SELECT 'doc-'||doc_id AS id, text AS document, lang FROM documents
        |WHERE lang IN ('en','fr') ORDER BY id""".stripMargin,

    "fc_key_arr_contains" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE list_contains([lang, source, 'tag'||(doc_id%7)], 'tag3')
        |ORDER BY id""".stripMargin,

    "fc_key_arr_contains_int" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE list_contains([doc_id%7, doc_id%11, 1000+doc_id%3], 4)
        |ORDER BY id""".stripMargin,

    "fc_get_ids_doc" ->
      """SELECT 'doc-'||doc_id AS id, text AS document, lang
        |FROM documents
        |WHERE doc_id % 3 = 0 AND doc_id <= 400
        |  AND lang = 'en' AND contains(text, 'data')
        |ORDER BY id""".stripMargin,

    // offset ids were assigned in id-string order (single ordered input
    // partition), so the filtered page walk pages the id order
    "fc_get_page" ->
      """SELECT page, id, document, lang FROM (
        |  SELECT CAST(floor((row_number() OVER (ORDER BY 'doc-'||doc_id)
        |      - 1) / 64.0) AS BIGINT) AS page,
        |    'doc-'||doc_id AS id, text AS document, lang
        |  FROM documents WHERE lang = 'en')
        |WHERE page <= 2 ORDER BY page, id""".stripMargin,

    "fc_key_inverted_and" ->
      """SELECT 'doc-'||doc_id AS id, text AS document, lang, source AS src
        |FROM documents WHERE lang = 'en' AND source = 'src3'
        |ORDER BY id""".stripMargin,

    "fc_key_inverted_cross_or" ->
      """SELECT 'doc-'||doc_id AS id, text AS document, lang, source AS src
        |FROM documents WHERE lang = 'fr' OR source IN ('src5','src7')
        |ORDER BY id""".stripMargin,

    "fc_key_bool_nested" ->
      """SELECT 'doc-'||doc_id AS id, text AS document, lang, source AS src
        |FROM documents
        |WHERE (lang = 'en' AND doc_id%100 >= 80)
        |   OR (lang = 'fr' AND source IN ('src5','src7'))
        |ORDER BY id""".stripMargin,

    "fc_key_or_doc_meta" ->
      """SELECT 'doc-'||doc_id AS id, text AS document, lang
        |FROM documents
        |WHERE contains(text, 'merge') OR lang = 'fr'
        |ORDER BY id""".stripMargin,

    "fc_key_range" ->
      """SELECT 'doc-'||doc_id AS id, text AS document FROM documents
        |WHERE doc_id%100 >= 17 AND doc_id%100 < 42 ORDER BY id""".stripMargin,

    "fc_key_range_str" ->
      """SELECT 'doc-'||doc_id AS id, text AS document, lang FROM documents
        |WHERE lang >= 'en' AND lang <= 'fr' ORDER BY id""".stripMargin,

    "fc_indexing_status" ->
      """SELECT round(CAST(a.c AS DOUBLE)/(a.c+b.c), 4) AS progress,
        |       b.c AS unindexed_ops, a.c AS indexed_ops,
        |       a.c+b.c AS total_ops
        |FROM (SELECT count(*) AS c FROM documents WHERE doc_id < 50) a,
        |     (SELECT count(*) AS c FROM documents
        |      WHERE doc_id >= 50 AND doc_id < 75) b""".stripMargin,

    "fc_read_levels" ->
      """WITH evens AS (
        |  SELECT 'doc-'||doc_id AS id, text AS document, doc_id
        |  FROM documents WHERE doc_id%2=0),
        |odds AS (
        |  SELECT 'doc-'||doc_id AS id, text AS document, doc_id
        |  FROM documents WHERE doc_id%2=1)
        |SELECT level, id, document FROM (
        |  SELECT 'index_only' AS level, id, document FROM evens
        |  UNION ALL
        |  SELECT 'bounded_1' AS level, id, document FROM evens
        |  UNION ALL
        |  SELECT 'bounded_1' AS level, id, document FROM odds
        |  UNION ALL
        |  SELECT 'index_and_wal' AS level, id,
        |    CASE WHEN doc_id%4=0 THEN 'EDITED' ELSE document END AS document
        |  FROM evens
        |  UNION ALL
        |  SELECT 'index_and_wal' AS level, id, document FROM odds)
        |ORDER BY level, id""".stripMargin,

    "fc_client_e2e" ->
      """WITH live AS (
        |  SELECT 'doc-'||doc_id AS id, text AS document, lang,
        |    CASE WHEN doc_id%3=0 THEN source ELSE NULL END AS src
        |  FROM documents WHERE lang <> 'de')
        |SELECT id, document, lang, src FROM live
        |WHERE contains(document, 'data')
        |ORDER BY id LIMIT 200 OFFSET 10""".stripMargin,

    "fc_chunk_ingest" ->
      s"""WITH ${PipelinePack.sqlChunkCte}
        |SELECT 'doc-'||doc_id||'#'||i AS id, chunk AS document,
        |  doc_id::VARCHAR AS parent, i::VARCHAR AS idx
        |FROM ch WHERE contains(chunk, 'merge')
        |ORDER BY id LIMIT 100""".stripMargin,

    "fc_nb_attached" ->
      s"""WITH ${TextAnalysis.sqlNbCte("TRUE", "TRUE", "lang = 'en'")}
        |SELECT 'doc-'||doc_id AS doc_id, n_toks, logodds, logodds > 0 AS pred
        |FROM agg ORDER BY doc_id""".stripMargin,

    "fc_sparse_search" ->
      """WITH tf AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents WHERE lang='en')),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2)
        |SELECT 'doc-'||doc_id AS id, CAST(sum(tf) AS FLOAT) AS score
        |FROM freq WHERE term IN ('query','data','filter','spark')
        |GROUP BY doc_id HAVING sum(tf) > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "fc_sparse_cfg_served" ->
      """WITH tf AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents)),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2)
        |SELECT 'doc-'||lpad(doc_id::VARCHAR, 8, '0') AS id,
        |  CAST(sum(tf) AS FLOAT) AS score
        |FROM freq WHERE term IN ('query','data','filter','spark')
        |GROUP BY doc_id HAVING sum(tf) > 0
        |ORDER BY score DESC, id LIMIT 20""".stripMargin,

    "fc_sparse_cfg_scan" ->
      """WITH tf AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents)),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2)
        |SELECT 'doc-'||lpad(doc_id::VARCHAR, 8, '0') AS id,
        |  CAST(sum(tf) AS FLOAT) AS score
        |FROM freq WHERE term IN ('query','data','filter','spark')
        |GROUP BY doc_id HAVING sum(tf) > 0
        |ORDER BY score DESC, id LIMIT 20""".stripMargin,

    "fc_search_sparse_json" ->
      """WITH tf AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents)),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2)
        |SELECT 'doc-'||doc_id AS id, CAST(sum(tf) AS FLOAT) AS score
        |FROM freq WHERE term IN ('query','data','filter','spark')
        |GROUP BY doc_id HAVING sum(tf) > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "fc_search_doc_filtered" ->
      """WITH tf AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents
        |     WHERE contains(text, 'sort merge'))),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2)
        |SELECT 'doc-'||doc_id AS id, CAST(sum(tf) AS FLOAT) AS score
        |FROM freq WHERE term IN ('query','data','filter','spark')
        |GROUP BY doc_id HAVING sum(tf) > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "fc_sparse_served" ->
      """WITH tf AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents)),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2)
        |SELECT doc_id, 'doc-'||doc_id AS id, CAST(sum(tf) AS FLOAT) AS score
        |FROM freq WHERE term IN ('query','data','filter','spark')
        |GROUP BY doc_id HAVING sum(tf) > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "fc_sparse_idf" ->
      """WITH tf AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents)),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n FROM documents),
        |idf AS (SELECT term,
        |          floor(ln(((SELECT n FROM n) - count(*) + 0.5) / (count(*) + 0.5) + 1.0)
        |            * 64) / 64 AS w
        |        FROM freq WHERE term IN ('query','data','filter','spark') GROUP BY term)
        |SELECT 'doc-'||f.doc_id AS id, CAST(sum(f.tf * idf.w) AS FLOAT) AS score
        |FROM freq f JOIN idf ON f.term = idf.term
        |GROUP BY f.doc_id HAVING sum(f.tf * idf.w) > 0
        |ORDER BY score DESC, f.doc_id LIMIT 20""".stripMargin,

    "fc_sparse_splade" ->
      """WITH tf0 AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents)),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf0 GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n FROM documents),
        |dfv AS (SELECT term, count(*) AS df FROM
        |          (SELECT DISTINCT doc_id, term FROM tf0) GROUP BY term),
        |vocab AS (SELECT term, df,
        |            row_number() OVER (ORDER BY df DESC, term) AS rn FROM dfv),
        |idf AS (SELECT term,
        |          floor(ln(((SELECT n FROM n) - df + 0.5) / (df + 0.5) + 1.0)
        |            * 64) / 64 AS idf
        |        FROM vocab WHERE rn <= 2048),
        |w AS (SELECT f.doc_id, f.term,
        |        floor(ln(1.0 + f.tf) * idf.idf * 1024) / 1024 AS w
        |      FROM freq f JOIN idf ON f.term = idf.term)
        |SELECT 'doc-'||doc_id AS id, CAST(sum(w) AS FLOAT) AS score
        |FROM w WHERE term IN ('query','data','filter','spark')
        |GROUP BY doc_id HAVING sum(w) > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "fc_sparse_bm25ef" ->
      """WITH tf AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents)),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tf GROUP BY 1),
        |v AS (SELECT f.doc_id, f.term,
        |        floor(f.tf::DOUBLE * 2.2 / (f.tf::DOUBLE
        |            + 1.2 * (0.25 + 0.75 * dl.dl::DOUBLE / 256.0)) * 1024.0) / 1024.0 AS val
        |      FROM freq f JOIN dl ON f.doc_id = dl.doc_id)
        |SELECT 'doc-'||doc_id AS id, CAST(sum(val) AS FLOAT) AS score
        |FROM v WHERE term IN ('query','data','filter','spark')
        |GROUP BY doc_id HAVING sum(val) > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "fc_dense_tfidf" ->
      """WITH tf0 AS (SELECT doc_id, unnest(t) AS term FROM
        |    (SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
        |       x -> x <> '') AS t FROM documents)),
        |freq AS (SELECT doc_id, term, count(*) AS tf FROM tf0 GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n FROM documents),
        |dfv AS (SELECT term, count(*) AS df FROM
        |          (SELECT DISTINCT doc_id, term FROM tf0) GROUP BY term),
        |vocab AS (SELECT term, df,
        |            row_number() OVER (ORDER BY df DESC, term) AS rn FROM dfv),
        |idf AS (SELECT term, rn - 1 AS slot,
        |          floor(ln(((SELECT n FROM n) - df + 0.5) / (df + 0.5) + 1.0)
        |            * 64) / 64 AS idf
        |        FROM vocab WHERE rn <= 64),
        |w AS (SELECT f.doc_id, i.slot,
        |        floor(ln(1.0 + f.tf) * i.idf * 1024) / 1024 AS w
        |      FROM freq f JOIN idf i ON f.term = i.term),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM w GROUP BY doc_id)
        |SELECT 'doc-'||w.doc_id AS id, w.slot,
        |       CAST(w.w / nrm.nn AS FLOAT) AS w
        |FROM w JOIN nrm ON w.doc_id = nrm.doc_id
        |WHERE w.w <> 0
        |ORDER BY id, slot""".stripMargin,

    "fc_search_json" ->
      """WITH q0 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |q1 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
        |cand AS (SELECT * FROM embeddings WHERE label <> 4),
        |l0 AS (SELECT vec_id, dist FROM
        |        (SELECT vec_id, 1.0 - list_cosine_similarity(embedding, q0.qe) AS dist,
        |           row_number() OVER (ORDER BY (1.0 - list_cosine_similarity(embedding, q0.qe)), vec_id) AS rn
        |         FROM cand, q0) WHERE rn <= 50),
        |l1 AS (SELECT vec_id, dist FROM
        |        (SELECT vec_id, 1.0 - list_cosine_similarity(embedding, q1.qe) AS dist,
        |           row_number() OVER (ORDER BY (1.0 - list_cosine_similarity(embedding, q1.qe)), vec_id) AS rn
        |         FROM cand, q1) WHERE rn <= 50),
        |f AS (SELECT coalesce(l0.vec_id, l1.vec_id) AS vec_id,
        |        0.7 * coalesce(l0.dist::DOUBLE, 2.0) + 0.3 * coalesce(l1.dist::DOUBLE, 2.0) AS score
        |      FROM l0 FULL OUTER JOIN l1 ON l0.vec_id = l1.vec_id),
        |j AS (SELECT f.vec_id, f.score, e.label::VARCHAR AS label
        |      FROM f JOIN embeddings e ON f.vec_id = e.vec_id),
        |g AS (SELECT vec_id, score, label,
        |        row_number() OVER (PARTITION BY label ORDER BY score, vec_id) AS rn
        |      FROM j)
        |SELECT 'vec-'||vec_id AS id, score, label FROM g WHERE rn = 1
        |ORDER BY score, id LIMIT 10""".stripMargin,

    "fc_search_grouped_keys" ->
      """WITH q0 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |l0 AS (SELECT vec_id, dist FROM
        |        (SELECT vec_id, 1.0 - list_cosine_similarity(embedding, q0.qe) AS dist,
        |           row_number() OVER (ORDER BY (1.0 - list_cosine_similarity(embedding, q0.qe)), vec_id) AS rn
        |         FROM embeddings, q0) WHERE rn <= 50),
        |j AS (SELECT l0.vec_id, l0.dist::DOUBLE AS score, e.label::BIGINT AS label,
        |        CASE WHEN e.vec_id % 3 <> 0 THEN (e.vec_id % 2 = 0) END AS even
        |      FROM l0 JOIN embeddings e ON l0.vec_id = e.vec_id),
        |g AS (SELECT vec_id, score, label, even,
        |        row_number() OVER (PARTITION BY even
        |          ORDER BY label DESC, score DESC, vec_id) AS rn FROM j)
        |SELECT 'vec-'||vec_id AS id, CAST(score AS FLOAT) AS score,
        |  CAST(label AS VARCHAR) AS label, CAST(even AS VARCHAR) AS even
        |FROM g WHERE rn <= 2
        |ORDER BY score, id LIMIT 10""".stripMargin,

    "fc_search_grouped" ->
      """WITH q0 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |q1 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
        |l0 AS (SELECT vec_id, dist FROM
        |        (SELECT vec_id, 1.0 - list_cosine_similarity(embedding, q0.qe) AS dist,
        |           row_number() OVER (ORDER BY (1.0 - list_cosine_similarity(embedding, q0.qe)), vec_id) AS rn
        |         FROM embeddings, q0) WHERE rn <= 50),
        |l1 AS (SELECT vec_id, dist FROM
        |        (SELECT vec_id, 1.0 - list_cosine_similarity(embedding, q1.qe) AS dist,
        |           row_number() OVER (ORDER BY (1.0 - list_cosine_similarity(embedding, q1.qe)), vec_id) AS rn
        |         FROM embeddings, q1) WHERE rn <= 50),
        |f AS (SELECT coalesce(l0.vec_id, l1.vec_id) AS vec_id,
        |        0.6 * coalesce(l0.dist::DOUBLE, 2.0) + 0.4 * coalesce(l1.dist::DOUBLE, 2.0) AS score
        |      FROM l0 FULL OUTER JOIN l1 ON l0.vec_id = l1.vec_id),
        |j AS (SELECT f.vec_id, f.score, e.label::BIGINT AS label
        |      FROM f JOIN embeddings e ON f.vec_id = e.vec_id),
        |g AS (SELECT vec_id, score, label,
        |        row_number() OVER (PARTITION BY label ORDER BY score, vec_id) AS rn
        |      FROM j)
        |SELECT 'vec-'||vec_id AS id, score, label FROM g WHERE rn = 1
        |ORDER BY score, id LIMIT 10""".stripMargin,
  )
}
