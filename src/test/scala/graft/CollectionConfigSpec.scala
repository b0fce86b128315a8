package graft

import graft.api.Client
import graft.sources.Catalog
import graft.sources.Catalog.{HnswConfigUpdate, HnswIndexConfig, SpannConfigUpdate, SpannIndexConfig}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-collection vector-index configuration — the reference's
  * `InternalCollectionConfiguration` (`collection_configuration.rs`):
  * HNSW/SPANN variants with the published defaults, the legacy `hnsw:*`
  * metadata fallback, descriptor persistence, the RESTRICTED update
  * surface (query-time knobs only — build parameters are immutable by
  * type), and the serving calls reading their knobs from the declared
  * config.
  */
class CollectionConfigSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def freshClient() = new Client(spark,
    java.nio.file.Files.createTempDirectory("cfg").toString)

  test("defaults parity: every config field carries the reference's default") {
    // hnsw_configuration.rs:42-74 / spann_configuration.rs:7-68 — a
    // drifted constant fails here by name
    val h = HnswIndexConfig()
    val hnswParity = Seq[(String, Any, Any)](
      ("space", h.space, "l2"),
      ("construction_ef", h.efConstruction, 100),
      ("search_ef", h.efSearch, 100),
      ("M", h.maxNeighbors, 16),
      ("resize_factor", h.resizeFactor, 1.2),
      ("sync_threshold", h.syncThreshold, 1000),
      ("batch_size", h.batchSize, 100))
    val s = SpannIndexConfig()
    val spannParity = Seq[(String, Any, Any)](
      ("space", s.space, "l2"),
      ("search_nprobe", s.searchNprobe, 64),
      ("write_nprobe", s.writeNprobe, 32),
      ("nreplica_count", s.nReplica, 8),
      ("split_threshold", s.splitThreshold, 50),
      ("merge_threshold", s.mergeThreshold, 25),
      ("construction_ef", s.efConstruction, 200),
      ("search_ef", s.efSearch, 200),
      ("M", s.maxNeighbors, 64),
      ("search_rng_factor", s.searchRngFactor, 1.0),
      ("search_rng_epsilon", s.searchRngEpsilon, 10.0),
      ("write_rng_factor", s.writeRngFactor, 1.0),
      ("write_rng_epsilon", s.writeRngEpsilon, 5.0),
      ("num_samples_kmeans", s.numSamplesKmeans, 1000),
      ("initial_lambda", s.initialLambda, 100.0),
      ("reassign_neighbor_count", s.reassignNeighborCount, 64),
      ("num_centers_to_merge_to", s.numCentersToMergeTo, 8))
    (hnswParity.map(("hnsw", _)) ++ spannParity.map(("spann", _))).foreach {
      case (kind, (field, got, want)) =>
        assert(got == want, s"$kind $field: $got != reference default $want")
    }
  }

  test("legacy hnsw:* metadata parses into the config with per-field defaults") {
    val md = Map("hnsw:space" -> "cosine", "hnsw:search_ef" -> "250",
      "hnsw:M" -> "32", "other" -> "x")
    val cfg = Catalog.VectorIndexConfig.fromLegacyMetadata(md).get
    assert(cfg.space == "cosine" && cfg.efSearch == 250 &&
      cfg.maxNeighbors == 32)
    assert(cfg.efConstruction == 100, "absent legacy keys take defaults")
    assert(Catalog.VectorIndexConfig.fromLegacyMetadata(
      Map("other" -> "x")).isEmpty, "no hnsw:* keys -> no legacy config")
    // resolution order: explicit schema config beats legacy metadata
    val explicit = HnswIndexConfig(space = "ip")
    assert(Catalog.effectiveVectorIndex(
      Catalog.Schema(vectorIndex = Some(explicit)), md).contains(explicit))
    assert(Catalog.effectiveVectorIndex(Catalog.Schema(), md).contains(cfg))
  }

  test("config persists through the descriptor and a reopen") {
    val c = freshClient()
    val declared = SpannIndexConfig(space = "cosine", searchNprobe = 12,
      splitThreshold = 80)
    c.createCollection("cfg_rt",
      Catalog.Schema(vectorIndex = Some(declared)))
    val reopened = c.getCollection("cfg_rt")
    assert(reopened.ref.schema.vectorIndex.contains(declared),
      s"descriptor round-trip lost the config: ${reopened.ref.schema.vectorIndex}")
    val h = HnswIndexConfig(space = "ip", efSearch = 321, resizeFactor = 1.5)
    c.createCollection("cfg_rt2", Catalog.Schema(vectorIndex = Some(h)))
    assert(c.getCollection("cfg_rt2").ref.schema.vectorIndex.contains(h))
  }

  test("update surface is the reference's: query knobs apply, variants don't cross") {
    val c = freshClient()
    c.createCollection("cfg_up", Catalog.Schema(
      vectorIndex = Some(SpannIndexConfig())))
    // spann update applies ONLY search_nprobe / ef_search
    val updated = c.updateCollectionConfig("cfg_up",
      spann = Some(SpannConfigUpdate(searchNprobe = Some(9),
        efSearch = Some(99))))
    updated.ref.schema.vectorIndex match {
      case Some(s: SpannIndexConfig) =>
        assert(s.searchNprobe == 9 && s.efSearch == 99)
        assert(s.splitThreshold == 50 && s.space == "l2",
          "non-updatable fields must be untouched")
      case other => fail(s"expected spann config, got $other")
    }
    // a mismatched-variant update is a no-op (the reference's if-let
    // fall-through), never a crossgrade
    val noop = c.updateCollectionConfig("cfg_up",
      hnsw = Some(HnswConfigUpdate(efSearch = Some(1))))
    noop.ref.schema.vectorIndex match {
      case Some(s: SpannIndexConfig) => assert(s.efSearch == 99)
      case other => fail(s"hnsw update crossgraded a spann config: $other")
    }
    // an undeclared collection updates against the engine's HISTORICAL
    // serving defaults (space 'cosine', ef 64) — NOT HnswIndexConfig()'s
    // 'l2': the collection has been serving cosine all along, and an
    // efSearch-only update must not silently flip its metric
    c.createCollection("cfg_up2")
    val fromDefault = c.updateCollectionConfig("cfg_up2",
      hnsw = Some(HnswConfigUpdate(maxNeighbors = Some(24))))
    fromDefault.ref.schema.vectorIndex match {
      case Some(h: HnswIndexConfig) =>
        assert(h.maxNeighbors == 24 && h.efConstruction == 100)
        assert(h.space == "cosine",
          s"in-passing declaration flipped the serving metric to ${h.space}")
        assert(h.efSearch == 64,
          s"in-passing declaration changed the serving ef to ${h.efSearch}")
      case other => fail(s"expected hnsw config, got $other")
    }
  }

  test("unknown legacy hnsw:* metadata keys reject by name") {
    // the reference's deny_unknown_fields parse
    // (hnsw_configuration.rs:205-231): a typo'd key must fail loudly,
    // not serve under defaults
    val e = intercept[IllegalArgumentException] {
      Catalog.VectorIndexConfig.fromLegacyMetadata(
        Map("hnsw:ef_search" -> "10", "hnsw:space" -> "cosine"))
    }
    assert(e.getMessage.contains("hnsw:ef_search"),
      s"rejection must name the offending key: ${e.getMessage}")
    // known keys alone still parse
    val ok = Catalog.VectorIndexConfig.fromLegacyMetadata(
      Map("hnsw:search_ef" -> "10", "hnsw:space" -> "cosine"))
    assert(ok.exists(h => h.efSearch == 10 && h.space == "cosine"))
    // the READ path must NOT brick a descriptor written before the
    // deny-unknown rule existed: effectiveVectorIndex parses non-strict —
    // unknown keys warn and are ignored, the knowns still serve
    val read = Catalog.effectiveVectorIndex(graft.sources.Catalog.Schema(),
      Map("hnsw:ef_search" -> "10", "hnsw:space" -> "cosine"))
    assert(read.exists(h => h.space == "cosine" &&
        h.asInstanceOf[Catalog.HnswIndexConfig].efSearch ==
          Catalog.HnswIndexConfig().efSearch),
      s"read-path parse should serve knowns + defaults, got $read")
  }

  test("a spann-config collection serves queryAnn from its config, rebalanced") {
    // no nprobe passed: the declared config's search_nprobe (64, the
    // reference default) exceeds the centroid count, so the served
    // answer is exhaustive and must equal brute force exactly; the
    // serving index is the split/merge-maintained one (the config's
    // split/merge thresholds are the compactor's knobs)
    val c = freshClient()
    val coll = c.createCollection("cfg_spann", Catalog.Schema(
      vectorIndex = Some(SpannIndexConfig(space = "cosine"))))
    val vecs = (0 until 64).map(i =>
      (s"v$i", "d", Seq(math.sin(i * 0.7).toFloat, math.cos(i * 1.3).toFloat,
        math.sin(i * 2.1 + 1).toFloat)))
    coll.add(vecs.toDF("id", "document", "embedding"))
    coll.persist()
    val h = c.getCollection("cfg_spann")
    val qs = Seq((0L, Seq(0.5f, -0.2f, 0.8f))).toDF("query_id", "q_embedding")
    // collect in RANK order on both sides: the query plans end in a join
    // whose output row order is build-side-dependent, so an unsorted
    // collect() flakes under full-suite scheduling pressure
    val served = h.queryAnn(qs, k = 5) // nprobe/replica/space from config
      .orderBy("rank").select("id").collect().map(_.getString(0)).toSeq
    val exact = h.query(qs, 5, space = "cosine")
      .orderBy("rank").select("id").collect().map(_.getString(0)).toSeq
    assert(served == exact,
      s"config-driven exhaustive queryAnn diverged: $served vs $exact")
    // without a spann config and without nprobe, the call fails loudly
    val plain = c.createCollection("cfg_plain")
    plain.add(vecs.take(4).toDF("id", "document", "embedding"))
    intercept[IllegalArgumentException] { plain.queryAnn(qs, k = 2) }
  }

  test("serving reads the declared config: space drives HNSW neighbor order") {
    // q=[1,0]: under inner-product the LONG OFF-ANGLE vector [8,6] wins
    // (ip = 8); under cosine the near-parallel unit vector wins — the
    // ONLY difference between the two collections is the declared
    // config's space
    val c = freshClient()
    def mk(name: String, space: String) = {
      val coll = c.createCollection(name, Catalog.Schema(
        vectorIndex = Some(HnswIndexConfig(space = space, efSearch = 50))))
      coll.add(Seq(
        ("long", "d", Seq(8f, 6f)),
        ("aligned", "d", Seq(1f, 0.001f)),
        ("off", "d", Seq(0.1f, 0.99f)))
        .toDF("id", "document", "embedding"))
      coll.persist()
      c.getCollection(name)
    }
    val qs = Seq((0L, Seq(1f, 0f))).toDF("query_id", "q_embedding")
    val ipTop = mk("cfg_ip", "ip").queryAnnHnsw(qs, k = 1)
      .select("id").collect().head.getString(0)
    val cosTop = mk("cfg_cos", "cosine").queryAnnHnsw(qs, k = 1)
      .select("id").collect().head.getString(0)
    assert(ipTop == "long", s"ip-config collection returned $ipTop")
    assert(cosTop == "aligned", s"cosine-config collection returned $cosTop")
  }

  test("per-key inverted index config: key-type × enabled/disabled/default routing table") {
    // the reference's per-key ValueTypes toggles
    // (collection_schema.rs:696-873; defaults :918-965 — inverted
    // indexes default-ENABLED for string/int/float/bool): an equality
    // filter on an enabled key serves from the bucket-partitioned
    // posting table (plan shows the meta_inverted scan, partition-pruned
    // at PLAN time); a disabled key takes the scan path (no posting scan
    // in the plan). Results are identical either way — the index only
    // narrows, the predicate always verifies.
    import graft.model.Where
    import graft.sources.Catalog.{KeyConfig, VBool, VFloat, VInt, VString}
    val c = freshClient()
    val cases = Seq[(String, graft.sources.Catalog.ValueType,
        Int => org.apache.spark.sql.DataFrame, Where.Expr, Set[Int])](
      ("str", VString,
        n => (0 until n).map(i => (s"r$i", s"doc $i",
          Map("tag" -> s"v${i % 3}"))).toDF("id", "document", "meta"),
        Where.Cmp("tag", "$eq", Where.VStr("v1")),
        (0 until 12).filter(_ % 3 == 1).toSet),
      ("int", VInt,
        n => (0 until n).map(i => (s"r$i", s"doc $i",
          Map("tag" -> (i % 3).toLong))).toDF("id", "document", "meta_int"),
        Where.Cmp("tag", "$eq", Where.VInt(1)),
        (0 until 12).filter(_ % 3 == 1).toSet),
      ("float", VFloat,
        n => (0 until n).map(i => (s"r$i", s"doc $i",
          Map("tag" -> (i % 3 + 0.5)))).toDF("id", "document", "meta_float"),
        Where.Cmp("tag", "$eq", Where.VFloat(1.5)),
        (0 until 12).filter(_ % 3 == 1).toSet),
      ("bool", VBool,
        n => (0 until n).map(i => (s"r$i", s"doc $i",
          Map("tag" -> (i % 2 == 0)))).toDF("id", "document", "meta_bool"),
        Where.Cmp("tag", "$eq", Where.VBool(true)),
        (0 until 12).filter(_ % 2 == 0).toSet),
      // array $contains through the same posting family: one posting
      // row per ELEMENT value (ContainsOperator, metadata.rs:2169) —
      // the shared "common" element proves per-element indexing (its
      // posting row holds every doc, yet the v1 probe stays selective)
      ("arr", graft.sources.Catalog.VStringArray,
        n => (0 until n).map(i => (s"r$i", s"doc $i",
          Map("tag" -> Seq(s"v${i % 3}", "common"))))
          .toDF("id", "document", "meta_str_arr"),
        Where.ArrContains("tag", Where.VStr("v1"), negated = false),
        (0 until 12).filter(_ % 3 == 1).toSet),
      // the other three element types of the reference's list metadata
      // union (MetadataValue::{Int,Float,Bool}Array, metadata.rs:346-352)
      // — numeric probes go through the promoted-double canonical term
      ("arr_int", graft.sources.Catalog.VIntArray,
        n => (0 until n).map(i => (s"r$i", s"doc $i",
          Map("tag" -> Seq((i % 3).toLong, 99L))))
          .toDF("id", "document", "meta_int_arr"),
        Where.ArrContains("tag", Where.VInt(1), negated = false),
        (0 until 12).filter(_ % 3 == 1).toSet),
      ("arr_float", graft.sources.Catalog.VFloatArray,
        n => (0 until n).map(i => (s"r$i", s"doc $i",
          Map("tag" -> Seq(i % 3 + 0.5, 99.0))))
          .toDF("id", "document", "meta_float_arr"),
        Where.ArrContains("tag", Where.VFloat(1.5), negated = false),
        (0 until 12).filter(_ % 3 == 1).toSet),
      ("arr_bool", graft.sources.Catalog.VBoolArray,
        n => (0 until n).map(i => (s"r$i", s"doc $i",
          Map("tag" -> Seq(i % 2 == 0))))
          .toDF("id", "document", "meta_bool_arr"),
        Where.ArrContains("tag", Where.VBool(true), negated = false),
        (0 until 12).filter(_ % 2 == 0).toSet))
    for ((tn, vt, mk, pred, expect) <- cases;
         (en, enabled) <- Seq(("on", Some(true)), ("off", Some(false)),
           ("default", None))) {
      val coll = c.createCollection(s"ki_${tn}_$en", graft.sources.Catalog
        .Schema(keys = Map("tag" -> KeyConfig(vt, invertedIndex = enabled))))
      coll.add(mk(12))
      coll.persist()
      val df = coll.get(where = Some(pred))
      val plan = df.queryExecution.executedPlan.toString
      val expectIndexed = enabled.getOrElse(true) // reference default: on
      assert(df.inputFiles.exists(_.contains("meta_inverted"))
          == expectIndexed,
        s"$tn/$en: expected indexed=$expectIndexed; inputs: " +
          df.inputFiles.mkString(", "))
      if (expectIndexed)
        assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bucket.*"),
          s"$tn/$en: posting scan not partition-pruned at plan time\n" +
            plan.take(1500))
      val got = df.select("id").collect().map(_.getString(0)).toSet
      assert(got == expect.map(i => s"r$i"),
        s"$tn/$en: wrong rows through the ${if (expectIndexed) "indexed"
          else "scan"} path: $got")
    }
    // the KNN plan routes its filter through the same posting prefilter
    // (the reference's Filter operator serves every read plan): query()
    // on an enabled key reads the posting table, a disabled key scans
    {
      import spark.implicits._
      val qOn = c.getCollection("ki_str_on")
      val qs = Seq((0L, Seq(1.0f))).toDF("query_id", "q_embedding")
      // records carry no embeddings — the filter leg still shapes the
      // plan; assert routing only (an empty KNN is fine)
      val df = qOn.query(qs, k = 2, where = Some(
        graft.model.Where.Cmp("tag", "$eq", graft.model.Where.VStr("v1"))))
      assert(df.inputFiles.exists(_.contains("meta_inverted")),
        "query() with an enabled-key filter must route through postings")
      val dfOff = c.getCollection("ki_str_off").query(qs, k = 2, where = Some(
        graft.model.Where.Cmp("tag", "$eq", graft.model.Where.VStr("v1"))))
      assert(!dfOff.inputFiles.exists(_.contains("meta_inverted")),
        "query() on a disabled key must take the scan path")
    }

    // the wire Search plan routes its filter through the prefilter too
    // (the reference's Filter operator serves EVERY read plan) — needs
    // an embedding for the rank leaf, so a dedicated tiny collection
    {
      import spark.implicits._
      val sColl = c.createCollection("ki_search", graft.sources.Catalog
        .Schema(keys = Map("tag" -> graft.sources.Catalog.KeyConfig(
          graft.sources.Catalog.VString))))
      sColl.add((0 until 8).map(i => (s"s$i", s"d $i",
          Map("tag" -> s"v${i % 2}"), Seq(i.toFloat, 1.0f)))
        .toDF("id", "document", "meta", "embedding"))
      sColl.persist()
      val payload = """{"filter": {"tag": {"$eq": "v1"}},
        |"rank": {"$knn": {"query": [1.0, 1.0], "limit": 8}},
        |"select": {"keys": []}}""".stripMargin
      val sdf = c.getCollection("ki_search").search(payload)
      assert(sdf.inputFiles.exists(_.contains("meta_inverted")),
        "search() with an enabled-key filter must route through postings")
      assert(sdf.select("id").collect().map(_.getString(0)).toSet ==
        Set("s1", "s3", "s5", "s7"))
    }

    // IndexAndWal with a live tail: a post-compaction write matching the
    // predicate must appear (tail ids join the allowed set), and an
    // update swinging a SEGMENT record's value must be honored over the
    // stale posting entry
    val coll = c.getCollection("ki_str_on")
    coll.add(Seq(("tail1", "tail doc", Map("tag" -> "v1")))
      .toDF("id", "document", "meta"))
    coll.update(Seq(("r1", "doc 1", Map("tag" -> "v2")))
      .toDF("id", "document", "meta"))
    val got2 = coll.get(where = Some(Where.Cmp("tag", "$eq",
      Where.VStr("v1")))).select("id").collect().map(_.getString(0)).toSet
    assert(got2 == Set("r4", "r7", "r10", "tail1"),
      s"tail merge through the indexed get is wrong: $got2")
  }

  test("indexed-eq ∧ $ne conjunctions: the composed route preserves two-valued semantics") {
    // the $ne leaf never routes (complement needs absent-key rows the
    // posting table cannot hold) — but an eq leaf on the SAME key still
    // prefilters, and the verify pass must then apply the $ne with the
    // reference's two-valued missing-key semantics (TRUE on absent).
    // Exhaustive (x, y) enumeration over present/absent keys, indexed
    // route vs scan route vs a driver-computed oracle.
    import graft.model.Where
    import graft.sources.Catalog.{KeyConfig, VString}
    import spark.implicits._
    val c = freshClient()
    // tag absent on i%4==3; j present only on evens
    val recs = (0 until 24).map { i =>
      val tag = if (i % 4 == 3) Map.empty[String, String]
        else Map("tag" -> s"v${i % 3}")
      val j = if (i % 2 == 0) Map("j" -> s"w${i % 2}") else Map.empty
      (s"r$i", s"doc $i", tag ++ j)
    }
    def mk(name: String, enabled: Boolean) = {
      val coll = c.createCollection(name, graft.sources.Catalog.Schema(
        keys = Map(
          "tag" -> KeyConfig(VString, invertedIndex = Some(enabled)),
          "j" -> KeyConfig(VString, invertedIndex = Some(false)))))
      coll.add(recs.toDF("id", "document", "meta"))
      coll.persist()
      coll
    }
    val on = mk("ne_on", enabled = true)
    val off = mk("ne_off", enabled = false)
    def oracle(p: ((Option[String], Option[String])) => Boolean): Set[String] =
      recs.collect { case (id, _, m)
        if p((m.get("tag"), m.get("j"))) => id }.toSet
    for (x <- Seq("v0", "v1", "v2"); y <- Seq("v0", "v1", "v2", "zz")) {
      val pred = Some(Where.And(Seq(
        Where.Cmp("tag", "$eq", Where.VStr(x)),
        Where.Cmp("tag", "$ne", Where.VStr(y)))))
      val want = oracle { case (t, _) => t.contains(x) && !t.contains(y) }
      val dfOn = on.get(where = pred)
      assert(dfOn.inputFiles.exists(_.contains("meta_inverted")),
        s"($x,$y): eq leaf must still route with a same-key \\$$ne beside it")
      val gotOn = dfOn.select("id").collect().map(_.getString(0)).toSet
      val gotOff = off.get(where = pred).select("id")
        .collect().map(_.getString(0)).toSet
      assert(gotOn == want, s"($x,$y) indexed: got $gotOn want $want")
      assert(gotOff == want, s"($x,$y) scan: got $gotOff want $want")
    }
    // cross-key: $ne on a DIFFERENT (unindexed) key — rows with j ABSENT
    // must SURVIVE the verify pass (TRUE on absent), through the indexed
    // prefilter on tag
    val predJ = Some(Where.And(Seq(
      Where.Cmp("tag", "$eq", Where.VStr("v1")),
      Where.Cmp("j", "$ne", Where.VStr("w0")))))
    val wantJ = oracle { case (t, j) => t.contains("v1") && !j.contains("w0") }
    val gotJ = on.get(where = predJ).select("id")
      .collect().map(_.getString(0)).toSet
    assert(gotJ == wantJ && wantJ.nonEmpty,
      s"cross-key \\$$ne through the indexed route: got $gotJ want $wantJ")
  }

  test("bitmap ∧/∨ through the postings: conjunctions intersect probes, " +
      "$or unions branches, one unroutable branch drops the Or") {
    import graft.model.Where
    import graft.sources.Catalog.{KeyConfig, VString}
    import spark.implicits._
    val c = freshClient()
    // a absent on i%5==4 (missing-key rows must never surface through
    // a probe); d's index is disabled — any Or touching it must scan
    val recs = (0 until 40).map { i =>
      val a = if (i % 5 == 4) Map.empty[String, String]
        else Map("a" -> s"v${i % 3}")
      (s"r$i", s"doc $i", a ++ Map("b" -> s"w${i % 4}", "d" -> s"u${i % 2}"))
    }
    val coll = c.createCollection("bitmap", graft.sources.Catalog.Schema(
      keys = Map(
        "a" -> KeyConfig(VString, invertedIndex = Some(true)),
        "b" -> KeyConfig(VString, invertedIndex = Some(true)),
        "d" -> KeyConfig(VString, invertedIndex = Some(false)))))
    coll.add(recs.toDF("id", "document", "meta"))
    coll.persist()
    def oracle(p: Map[String, String] => Boolean): Set[String] =
      recs.collect { case (id, _, m) if p(m) => id }.toSet
    def got(pred: Where.Expr): (Set[String], Seq[String]) = {
      val df = coll.get(where = Some(pred))
      (df.select("id").collect().map(_.getString(0)).toSet,
        df.inputFiles.filter(_.contains("meta_inverted")).toSeq)
    }
    // ∧: BOTH eq leaves probe — both posting tables in the scan set
    val (andGot, andIn) = got(Where.And(Seq(
      Where.Cmp("a", "$eq", Where.VStr("v1")),
      Where.Cmp("b", "$eq", Where.VStr("w2")))))
    assert(andGot == oracle(m => m.get("a").contains("v1") &&
      m.get("b").contains("w2")) && andGot.nonEmpty, s"and: $andGot")
    assert(andIn.exists(_.contains("meta_inverted/a/")) &&
      andIn.exists(_.contains("meta_inverted/b/")),
      s"conjunction must probe BOTH posting tables, saw: $andIn")
    // ∨ (cross-key): union of branch probes, still index-served
    val (orGot, orIn) = got(Where.Or(Seq(
      Where.Cmp("a", "$eq", Where.VStr("v0")),
      Where.SetIn("b", Seq(Where.VStr("w1"), Where.VStr("w3")),
        negated = false))))
    assert(orGot == oracle(m => m.get("a").contains("v0") ||
      Set("w1", "w3").exists(m.get("b").contains)) && orGot.nonEmpty,
      s"or: $orGot")
    assert(orIn.exists(_.contains("meta_inverted/a/")) &&
      orIn.exists(_.contains("meta_inverted/b/")),
      s"\\$$or must union BOTH branch probes, saw: $orIn")
    // ∨ with a disabled-key branch: the whole Or is unroutable (its
    // matches can live outside every posting table) — scan, same rows
    val (badGot, badIn) = got(Where.Or(Seq(
      Where.Cmp("a", "$eq", Where.VStr("v0")),
      Where.Cmp("d", "$eq", Where.VStr("u1")))))
    assert(badGot == oracle(m => m.get("a").contains("v0") ||
      m.get("d").contains("u1")) && badGot.nonEmpty, s"or-bad: $badGot")
    assert(badIn.isEmpty,
      s"an Or with a disabled-key branch must take the scan path: $badIn")
    // mixed conjunction: eq probe ∧ (all-indexable Or union)
    val (mixGot, mixIn) = got(Where.And(Seq(
      Where.Cmp("a", "$eq", Where.VStr("v1")),
      Where.Or(Seq(
        Where.Cmp("b", "$eq", Where.VStr("w1")),
        Where.Cmp("b", "$eq", Where.VStr("w3")))))))
    assert(mixGot == oracle(m => m.get("a").contains("v1") &&
      Set("w1", "w3").exists(m.get("b").contains)) && mixGot.nonEmpty,
      s"mixed: $mixGot")
    assert(mixIn.exists(_.contains("meta_inverted/a/")) &&
      mixIn.exists(_.contains("meta_inverted/b/")),
      s"eq ∧ Or must route both legs, saw: $mixIn")
  }

  test("recursive bitmap algebra: nested and/or routes every leg incl. " +
      "range and FTS probes; an Or branch with no routable piece scans") {
    import graft.model.Where
    import graft.sources.Catalog.{KeyConfig, VString, VInt}
    import spark.implicits._
    val c = freshClient()
    val recs = (0 until 60).map { i =>
      (s"r$i", s"doc $i ${if (i % 7 == 0) "needleval" else "plain"}",
        Map("a" -> s"v${i % 3}", "d" -> s"u${i % 2}"),
        Map("n" -> (i % 50).toLong))
    }
    val coll = c.createCollection("recursive", graft.sources.Catalog.Schema(
      documentFts = true,
      keys = Map(
        "a" -> KeyConfig(VString, invertedIndex = Some(true)),
        "n" -> KeyConfig(VInt, invertedIndex = Some(true)),
        "d" -> KeyConfig(VString, invertedIndex = Some(false)))))
    coll.add(recs.toDF("id", "document", "meta", "meta_int"))
    coll.persist()
    def oracle(p: ((String, String, Map[String, String], Map[String, Long]))
        => Boolean): Set[String] =
      recs.collect { case r if p(r) => r._1 }.toSet
    def got(pred: Where.Expr): (Set[String], Seq[String]) = {
      val df = coll.get(where = Some(pred))
      (df.select("id").collect().map(_.getString(0)).toSet,
        df.inputFiles.filter(f => f.contains("meta_inverted") ||
          f.contains("meta_range") || f.contains("fts/")).toSeq)
    }
    // nested Or-of-Ands spanning all three index families: eq postings,
    // value-ordered range postings, trigram FTS — every leg must probe
    val (nGot, nIn) = got(Where.Or(Seq(
      Where.And(Seq(Where.Cmp("a", "$eq", Where.VStr("v0")),
        Where.Cmp("n", "$gte", Where.VInt(30)))),
      Where.And(Seq(Where.Cmp("a", "$eq", Where.VStr("v1")),
        Where.DocContains("needleval", negated = false))))))
    assert(nGot == oracle { case (_, doc, m, mi) =>
      (m("a") == "v0" && mi("n") >= 30) ||
        (m("a") == "v1" && doc.contains("needleval")) } && nGot.nonEmpty,
      s"nested: $nGot")
    assert(nIn.exists(_.contains("meta_inverted/a/")) &&
      nIn.exists(_.contains("meta_range/n/")) &&
      nIn.exists(_.contains("fts/")),
      s"all three families must probe, saw: $nIn")
    // an Or branch whose And has NO routable piece (disabled key + a
    // negation) cannot narrow — the whole read takes the scan path
    val (sGot, sIn) = got(Where.Or(Seq(
      Where.Cmp("a", "$eq", Where.VStr("v0")),
      Where.And(Seq(Where.Cmp("d", "$eq", Where.VStr("u0")),
        Where.Cmp("d", "$ne", Where.VStr("u1")))))))
    assert(sGot == oracle { case (_, _, m, _) =>
      m("a") == "v0" || (m("d") == "u0" && m("d") != "u1") } && sGot.nonEmpty,
      s"scan-fallback: $sGot")
    assert(sIn.isEmpty,
      s"an Or branch with no routable piece must force the scan: $sIn")
    // an Or branch And with a disabled leg but one routable leg still
    // routes — the routable leg's candidates are a superset of the And
    val (pGot, pIn) = got(Where.Or(Seq(
      Where.Cmp("a", "$eq", Where.VStr("v2")),
      Where.And(Seq(Where.Cmp("a", "$eq", Where.VStr("v1")),
        Where.Cmp("d", "$eq", Where.VStr("u0")))))))
    assert(pGot == oracle { case (_, _, m, _) =>
      m("a") == "v2" || (m("a") == "v1" && m("d") == "u0") } && pGot.nonEmpty,
      s"partial-and: $pGot")
    assert(pIn.exists(_.contains("meta_inverted/a/")),
      s"partially-routable And branch must still probe: $pIn")
  }

  test("range predicates route through the value-ordered postings, bucket-pruned; disabled keys scan") {
    // the range-scan leg of the per-key index config — the reference
    // serves $gt/$gte/$lt/$lte from sorted typed keys
    // (rust/index/src/metadata/types.rs:580-676); here the VALUE-ORDERED
    // posting layout (MetaRange) with driver-read bounds → literal
    // rbucket IN → static partition pruning. Disabled keys take the
    // scan path; results are identical either way (prefilter-then-verify).
    import graft.model.Where
    import graft.sources.Catalog.{KeyConfig, VInt}
    import spark.implicits._
    val c = freshClient()
    def mk(name: String, enabled: Option[Boolean]) = {
      val coll = c.createCollection(name, graft.sources.Catalog.Schema(
        keys = Map("par" -> KeyConfig(VInt, invertedIndex = enabled))))
      coll.add((0 until 64).map(i => (s"r$i", s"doc $i",
        Map("par" -> i.toLong))).toDF("id", "document", "meta_int"))
      coll.persist()
      coll
    }
    val pred = Some(Where.And(Seq(
      Where.Cmp("par", "$gte", Where.VInt(10)),
      Where.Cmp("par", "$lt", Where.VInt(20)))))
    val expect = (10 until 20).map(i => s"r$i").toSet
    val dfOn = mk("kr_on", Some(true)).get(where = pred)
    assert(dfOn.inputFiles.exists(_.contains("meta_range")),
      "enabled key must route ranges through the value-ordered postings")
    val plan = dfOn.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*rbucket.*"),
      s"range probe not partition-pruned at plan time\n${plan.take(1500)}")
    assert(dfOn.select("id").collect().map(_.getString(0)).toSet == expect)
    val dfOff = mk("kr_off", Some(false)).get(where = pred)
    assert(!dfOff.inputFiles.exists(_.contains("meta_range")),
      "disabled key must take the scan path")
    assert(dfOff.select("id").collect().map(_.getString(0)).toSet == expect)

    // IndexAndWal with a live tail: a post-compaction write inside the
    // range must appear (tail ids join the allowed set unconditionally),
    // an update swinging a segment value OUT of the range must vanish
    val coll = c.getCollection("kr_on")
    coll.add(Seq(("tail1", "tail doc", Map("par" -> 15L)))
      .toDF("id", "document", "meta_int"))
    coll.update(Seq(("r12", "doc 12", Map("par" -> 99L)))
      .toDF("id", "document", "meta_int"))
    val got2 = coll.get(where = pred).select("id")
      .collect().map(_.getString(0)).toSet
    assert(got2 == expect - "r12" + "tail1",
      s"tail merge through the range-indexed get is wrong: $got2")
  }

  test("sparse per-key config: indexed=true serves the posting index, false scans; RYW parity") {
    // the sparse sibling of the scalar inverted-index gating
    // (sparse_vector_index, collection_schema.rs:745-873): both paths
    // are EXACT, so enabled vs disabled twins must return identical
    // (id, score) rows at every read level — only the plan differs.
    import graft.sources.Catalog.{KeyConfig, VSparseVector}
    import spark.implicits._
    val c = freshClient()
    def vecOf(terms: Seq[(Long, Float)]) = terms.sortBy(_._1)
    val docs = Seq(
      ("a", Seq(1L -> 3f, 2L -> 1f)), ("b", Seq(2L -> 2f, 5L -> 4f)),
      ("c", Seq(1L -> 1f, 5L -> 1f)), ("d", Seq(7L -> 9f)))
    def mk(name: String, indexed: Boolean) = {
      val coll = c.createCollection(name, graft.sources.Catalog.Schema(
        keys = Map("s" -> KeyConfig(VSparseVector, indexed = indexed))))
      coll.add(docs.map { case (id, t) =>
          val v = vecOf(t)
          (id, s"doc $id", v.map(_._1), v.map(_._2))
        }.toDF("id", "document", "idx", "vals")
        .select(col("id"), col("document"), map(lit("s"),
          struct(col("idx").as("indices"), col("vals").as("values")))
          .as("meta_sparse")))
      coll.persist()
      coll
    }
    val on = mk("sp_on", indexed = true)
    val off = mk("sp_off", indexed = false)
    val q = Seq(1L -> 1f, 5L -> 1f)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), math.round(
        r.getDouble(1) * 100))).toSeq.sortBy(identity[(String, Long)])
    val dfOn = on.sparseSearch("s", q, k = 3)
    val dfOff = off.sparseSearch("s", q, k = 3)
    // the served result crosses MaxScore's RDD boundary (inputFiles
    // cannot see through it) — gate on the posting-index artifact: the
    // enabled key builds/serves `sparse_s`, the disabled key never does
    def hasSparseDir(root: String): Boolean = {
      val base = java.nio.file.Paths.get(root)
      java.nio.file.Files.walk(base).anyMatch(p =>
        p.getFileName != null && p.getFileName.toString == "sparse_s")
    }
    assert(hasSparseDir(on.ref.dataRoot),
      "indexed=true must build + serve the persisted sparse posting index")
    assert(!hasSparseDir(off.ref.dataRoot),
      "indexed=false must take the meta_sparse scan path (no index built)")
    assert(rows(dfOn) == rows(dfOff), s"${rows(dfOn)} != ${rows(dfOff)}")
    assert(rows(dfOn).map(_._1).toSet == Set("a", "b", "c"))

    // RYW through the served path: a tail add scores (extra posting
    // rows), a tail update shadows its stale indexed vector, a delete
    // disappears — and the scan twin (same ops) agrees exactly
    for (coll <- Seq(on, off)) {
      coll.add(Seq(("e", "doc e")).toDF("id", "document")
        .select(col("id"), col("document"), map(lit("s"),
          struct(array(lit(1L)).as("indices"),
            array(lit(10f)).as("values"))).as("meta_sparse")))
      coll.update(Seq(("a", "doc a")).toDF("id", "document")
        .select(col("id"), col("document"), map(lit("s"),
          struct(array(lit(5L)).as("indices"),
            array(lit(7f)).as("values"))).as("meta_sparse")))
      coll.delete(Seq("b"))
    }
    val tOn = rows(on.sparseSearch("s", q, k = 4))
    val tOff = rows(off.sparseSearch("s", q, k = 4))
    assert(tOn == tOff, s"RYW served $tOn != scan $tOff")
    assert(tOn.map(_._1).toSet == Set("a", "c", "e"),
      s"tail add/update/delete not honored: $tOn")
    // IndexOnly skips the tail on both paths
    val iOn = rows(on.sparseSearch("s", q, k = 4,
      readLevel = graft.api.ReadLevel.IndexOnly))
    val iOff = rows(off.sparseSearch("s", q, k = 4,
      readLevel = graft.api.ReadLevel.IndexOnly))
    assert(iOn == iOff && iOn.map(_._1).toSet == Set("a", "b", "c"),
      s"IndexOnly sparse read drifted: $iOn vs $iOff")
  }

  test("document FTS toggle routes $contains: enabled → trigram index, disabled → scan") {
    import graft.model.Where
    val c = freshClient()
    def mk(name: String, fts: Boolean) = {
      val coll = c.createCollection(name,
        graft.sources.Catalog.Schema(documentFts = fts))
      coll.add((0 until 20).map(i => (s"d$i",
        if (i % 4 == 0) s"needle in haystack $i" else s"plain text $i"))
        .toDF("id", "document"))
      coll.persist()
      coll
    }
    val on = mk("fts_on", fts = true)
    val off = mk("fts_off", fts = false)
    val pred = Some(Where.DocContains("needle in", negated = false))
    val dfOn = on.get(where = pred)
    val dfOff = off.get(where = pred)
    assert(dfOn.queryExecution.executedPlan.toString.contains("fts"),
      "fts-enabled collection must serve $contains from the trigram index")
    assert(!dfOff.queryExecution.executedPlan.toString.contains("fts/postings"),
      "fts-disabled collection must take the scan path")
    val expect = (0 until 20).filter(_ % 4 == 0).map(i => s"d$i").toSet
    assert(dfOn.select("id").collect().map(_.getString(0)).toSet == expect)
    assert(dfOff.select("id").collect().map(_.getString(0)).toSet == expect)
  }

  test("driver-side renderValue == Spark-side valueCol, bit for bit") {
    // the posting probe compares the DRIVER rendering of the query
    // literal against the SPARK rendering of stored values — any
    // formatting drift (double shortest-repr, int promotion, bool case)
    // silently empties the candidate set, so pin equality over awkward
    // values: extremes, precision-losing longs, subnormals, negzero
    import graft.model.Where._
    import graft.operators.MetaInverted
    import graft.sources.Catalog
    val rnd = new scala.util.Random(7)
    val ints: Seq[Long] = Seq(0L, 1L, -1L, 42L, Long.MaxValue,
      Long.MinValue, (1L << 53) + 1) ++ Seq.fill(24)(rnd.nextLong())
    val floats: Seq[Double] = Seq(0.0, -0.0, 1.5, 0.1, 1e-300, 1e300,
      math.Pi, Double.MinPositiveValue, 2.2250738585072014e-308) ++
      Seq.fill(24)(rnd.nextDouble() * math.pow(10, rnd.nextInt(21) - 10))
    def sparkRender(rows: Seq[(Long, Map[String, Any])],
        vtype: Catalog.ValueType): Seq[String] = {
      val df = vtype match {
        case Catalog.VInt => rows.map { case (i, m) =>
          (i, m.view.mapValues(_.asInstanceOf[Long]).toMap) }
          .toDF("offset_id", "meta_int")
        case Catalog.VFloat => rows.map { case (i, m) =>
          (i, m.view.mapValues(_.asInstanceOf[Double]).toMap) }
          .toDF("offset_id", "meta_float")
        case Catalog.VBool => rows.map { case (i, m) =>
          (i, m.view.mapValues(_.asInstanceOf[Boolean]).toMap) }
          .toDF("offset_id", "meta_bool")
        case _ => fail("unexpected type")
      }
      df.select(col("offset_id"),
          MetaInverted.valueCol(df, "k", vtype).as("v"))
        .orderBy("offset_id").collect().map(_.getString(1)).toSeq
    }
    val gotInt = sparkRender(
      ints.zipWithIndex.map { case (v, i) => (i.toLong, Map("k" -> v)) },
      Catalog.VInt)
    for ((v, g) <- ints.zip(gotInt))
      assert(g == MetaInverted.renderValue(VInt(v)),
        s"int $v: spark '$g' != driver '${MetaInverted.renderValue(VInt(v))}'")
    val gotF = sparkRender(
      floats.zipWithIndex.map { case (v, i) => (i.toLong, Map("k" -> v)) },
      Catalog.VFloat)
    for ((v, g) <- floats.zip(gotF))
      assert(g == MetaInverted.renderValue(VFloat(v)),
        s"float $v: spark '$g' != driver '${MetaInverted.renderValue(VFloat(v))}'")
    val gotB = sparkRender(Seq((0L, Map("k" -> true)),
      (1L, Map("k" -> false))), Catalog.VBool)
    assert(gotB == Seq(MetaInverted.renderValue(VBool(true)),
      MetaInverted.renderValue(VBool(false))))
  }

  test("re-compaction at constant row count rebuilds the posting table (content keying)") {
    // the build key carries the segment CONTENT fingerprint: an update
    // that swings a value without changing the row count must re-key the
    // posting build, or the indexed get would serve stale postings and
    // silently drop the moved row
    import graft.model.Where
    import graft.sources.Catalog.{KeyConfig, VString}
    val c = freshClient()
    val coll = c.createCollection("ki_recompact", graft.sources.Catalog
      .Schema(keys = Map("tag" -> KeyConfig(VString))))
    coll.add((0 until 12).map(i => (s"r$i", s"doc $i",
      Map("tag" -> s"v${i % 3}"))).toDF("id", "document", "meta"))
    coll.persist()
    val pred = Some(Where.Cmp("tag", "$eq", Where.VStr("v1")))
    def ids(h: graft.api.CollectionHandle) =
      h.get(where = pred).select("id").collect().map(_.getString(0)).toSet
    assert(ids(coll) == Set("r1", "r4", "r7", "r10"))
    // swing r2 v2→v1 and RE-COMPACT: count unchanged, content changed
    coll.update(Seq(("r2", "doc 2", Map("tag" -> "v1")))
      .toDF("id", "document", "meta"))
    coll.persist()
    val reopened = c.getCollection("ki_recompact")
    val got = ids(reopened)
    assert(got == Set("r1", "r2", "r4", "r7", "r10"),
      s"stale posting table survived a same-count re-compaction: $got")
    // and the route is still the indexed one, not a silent scan fallback
    assert(reopened.get(where = pred).inputFiles
        .exists(_.contains("meta_inverted")),
      "re-compacted read fell back to the scan path")
  }

  test("unknown legacy hnsw:* metadata rejects at CREATE, not first query") {
    val c = freshClient()
    intercept[IllegalArgumentException] {
      c.createCollection("legacy_bad",
        metadata = Map("hnsw:ef_search" -> "10"))
    }
    // and on metadata replacement
    c.createCollection("legacy_ok", metadata = Map("hnsw:space" -> "cosine"))
    intercept[IllegalArgumentException] {
      c.modifyCollection("legacy_ok",
        metadata = Some(Map("hnsw:bad_key" -> "1")))
    }
  }

  test("per-key index config: descriptor round-trip and the reference's rules") {
    import graft.sources.Catalog.{KeyConfig, VInt, VSparseVector, VString}
    val c = freshClient()
    c.createCollection("ki_rt", graft.sources.Catalog.Schema(keys = Map(
      "a" -> KeyConfig(VString, invertedIndex = Some(false)),
      "b" -> KeyConfig(VInt))))
    val re = c.getCollection("ki_rt").ref.schema.keys
    assert(re("a").invertedIndex.contains(false) &&
      re("b").invertedIndex.isEmpty,
      s"per-key config lost in the descriptor round-trip: $re")
    // FTS enables only on #document (collection_schema.rs:96)
    intercept[IllegalArgumentException] {
      c.createCollection("ki_bad1", graft.sources.Catalog.Schema(keys = Map(
        "a" -> KeyConfig(VString, ftsIndex = Some(true)))))
    }
    // no inverted index exists for sparse keys
    intercept[IllegalArgumentException] {
      c.createCollection("ki_bad2", graft.sources.Catalog.Schema(keys = Map(
        "s" -> KeyConfig(VSparseVector, invertedIndex = Some(true)))))
    }
  }
}
