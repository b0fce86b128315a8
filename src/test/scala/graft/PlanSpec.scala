package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape gates — the scale properties the engine is designed
  * around must stay visible in the plan, or a refactor silently turned a
  * map-side design into a shuffle-everything design.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q6: filters push into the parquet scan and schema is pruned") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(500))
    assert(p.contains("partial_sum"), "aggregate must be partial (map-side)")
    assert(!p.contains("l_orderkey"), "unused columns must be pruned from the scan")
  }

  test("q5: dimension joins broadcast; fact table never pre-shuffled") {
    val p = plan("q5_local_volume")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "dims should broadcast, not sort-merge")
  }

  test("knn: top-k is a partial aggregate (k rows per partition shuffle)") {
    val p = plan("vs_knn_cosine")
    assert(p.contains("partial_topkagg"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin"), "queries must broadcast")
    assert(!p.contains("Window"), "window top-k would shuffle every candidate row")
  }

  test("knn: distance kernel runs inline in the projection (codegen), not a UDF") {
    val p = plan("vs_knn_cosine")
    assert(p.contains("cosine_similarity"), p.take(800))
    assert(!p.toLowerCase.contains("batchevalpython"))
  }

  test("sparse knn: hashed term ids, no single-partition dictionary window") {
    for (q <- Seq("sp_sparse_knn", "sp_sparse_knn_maxscore")) {
      val p = plan(q)
      assert(!p.contains("Window"),
        s"$q must not funnel the vocabulary through a global window\n" + p.take(800))
    }
  }

  test("bm25: single one-row broadcast agg, TakeOrdered top-k, no wide shuffle") {
    val p = plan("sp_bm25_rank")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "corpus stats must broadcast as a single row")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "BM25 must not shuffle-join the corpus:\n" + p.take(800))
    // the only Exchange allowed is the single-row stats aggregate's
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(800))
  }

  test("perplexity: no forced broadcast of the LM tables; partial per-doc agg") {
    // at sf0.001 Catalyst rightly broadcasts the tiny LM tables by its
    // size estimate — what must NOT happen is a broadcast() HINT forcing
    // that choice at corpus scale, where the vocab-sized tables would OOM
    // the driver. The only hinted broadcast is the one-row vocab count.
    val df = SparkEntry.queries("ta_perplexity")(spark, sf)
    val hints = "ResolvedHint".r
      .findAllIn(df.queryExecution.analyzed.toString).size
    assert(hints == 1,
      s"expected exactly the one-row vocab broadcast hint, found $hints")
    val p = plan("ta_perplexity")
    assert(p.contains("partial_sum"), "per-doc reduce must map-side combine")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the vocab cardinality joins as a single broadcast row")
  }

  test("stupid backoff: no forced broadcast of the count tables; partial per-doc agg") {
    // same contract as ta_perplexity: the three count tables are
    // n-gram-vocabulary-sized and must reach the scoring joins unhinted
    // (Catalyst may still size-estimate-broadcast them at tiny SF); the
    // only hinted broadcast is the one-row corpus-size aggregate.
    val df = SparkEntry.queries("ta_stupid_backoff")(spark, sf)
    val hints = "ResolvedHint".r
      .findAllIn(df.queryExecution.analyzed.toString).size
    assert(hints == 1,
      s"expected exactly the one-row corpus-size broadcast hint, found $hints")
    val p = plan("ta_stupid_backoff")
    assert(p.contains("partial_sum"), "per-doc reduce must map-side combine")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the corpus size joins as a single broadcast row")
  }

  test("nb classifier: only the two one-row aggs are hint-broadcast; partial per-doc agg") {
    // same contract as the LMs: the class-pivot word table is vocab-sized
    // and must reach the scoring join unhinted; the hinted broadcasts are
    // exactly the one-row token-totals and doc-priors aggregates.
    val df = SparkEntry.queries("ta_nb_quality")(spark, sf)
    val hints = "ResolvedHint".r
      .findAllIn(df.queryExecution.analyzed.toString).size
    assert(hints == 2,
      s"expected the totals + priors one-row broadcast hints, found $hints")
    val p = plan("ta_nb_quality")
    assert(p.contains("partial_sum"), "per-doc reduce must map-side combine")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the one-row aggregates join as broadcast rows")
  }

  test("chunking: one output-sort exchange; the window explode is map-side") {
    val p = plan("pl_chunk_windows")
    assert(p.contains("Generate explode"), p.take(800))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1,
      s"chunking must shuffle only for the output ORDER BY, found $exchanges\n" +
        p.take(800))
    assert(p.contains("rangepartitioning"),
      "the single exchange is the output sort")
  }

  test("embedding drift: cell aggregation map-side combines before the shuffle") {
    val p = plan("vs_embedding_drift")
    assert(p.contains("partial_sum"),
      "the (label, dim) cell agg must partial-aggregate — the shuffle is " +
        "labels×dims per partition, never rows×dims\n" + p.take(800))
    assert(!p.contains("Window"), "no global window anywhere in the drift plan")
  }

  test("collocations / domain drift: only the one-row total is hint-broadcast") {
    // the count tables are vocab-/support-sized and must reach their
    // joins unhinted, same contract as the LM scorers
    for (q <- Seq("ta_collocations", "ta_domain_drift")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val hints = "ResolvedHint".r
        .findAllIn(df.queryExecution.analyzed.toString).size
      assert(hints == 1,
        s"$q: expected exactly the one-row total broadcast hint, found $hints")
    }
  }

  test("dsir: two one-row vocab broadcasts only; sample is TakeOrdered, not a window") {
    val df = SparkEntry.queries("pl_dsir_weights")(spark, sf)
    val hints = "ResolvedHint".r
      .findAllIn(df.queryExecution.analyzed.toString).size
    assert(hints == 2,
      s"expected exactly the two one-row vocab broadcast hints, found $hints")
    val p = plan("pl_dsir_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "the weight resample must be a distributed top-k, not a global window\n" +
        p.take(800))
    assert(!p.contains("Window"), p.take(800))
  }

  test("similarity join: left/query side broadcasts (no candidate shuffle)") {
    val p = plan("vs_similarity_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("partial_topkagg"), "per-left top-k must be a partial aggregate")
  }

  test("jaccard: vocabulary df-filter is a shuffle semi-join, never broadcast") {
    // `rare` is vocab-sized (billions of shingles at corpus scale) — a
    // broadcast there OOMs before the pair self-join even starts.
    val p = plan("dd_ngram_jaccard")
    assert(p.contains("ShuffledHashJoin") && p.contains("LeftSemi"), p.take(1200))
    assert(!p.split("\n").exists(l => l.contains("Broadcast") && l.contains("LeftSemi")),
      "rare-shingle semi-join must not broadcast the vocabulary\n" + p.take(1200))
  }

  test("embedding near-dup ANN: pairs join is key-equi on centroid_id, not cartesian") {
    val p = plan("dd_emb_ann")
    assert(!p.contains("CartesianProduct"),
      "posting co-membership must join on centroid_id, not cross-join\n" + p.take(800))
  }

  test("facade sparse search: query vector broadcasts; dot is the codegen kernel") {
    val p = plan("fc_sparse_search")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(800))
    assert(p.contains("sparse_dot"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("multi-bit quantized: coarse pass broadcasts queries, partial top-k") {
    val p = plan("vs_quantized_mb")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("partial_topkagg"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("two distance kernels in one codegen'd projection compile (freshName locals)") {
    import org.apache.spark.sql.functions._
    import graft.functions.Distances
    import SparkTestSession.spark.implicits._
    // Duplicate fixed locals would fail Janino and silently fall back to
    // interpreted eval; with CODEGEN_FACTORY_MODE default this still returns
    // correct values, so assert correctness AND force codegen-only.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((Seq(1f, 0f), Seq(1f, 1f))).toDF("a", "b")
        .select(
          Distances.cosineSimilarity(col("a"), col("b")).as("c1"),
          Distances.cosineSimilarity(col("b"), col("a")).as("c2"),
          Distances.l2Squared(col("a"), col("b")).as("l1"),
          Distances.l2Squared(col("b"), col("a")).as("l2"),
          graft.functions.SparseOps.sparseDot(
            array(lit(1), lit(3)), array(lit(1f), lit(2f)),
            array(lit(1), lit(3)), array(lit(1f), lit(2f))).as("s1"),
          graft.functions.SparseOps.sparseDot(
            array(lit(2)), array(lit(5f)),
            array(lit(2)), array(lit(3f))).as("s2"))
      val r = df.collect()(0)
      assert(math.abs(r.getFloat(0) - r.getFloat(1)) < 1e-6f)
      assert(r.getFloat(2) == 1f && r.getFloat(3) == 1f)
      assert(r.getFloat(4) == 5f && r.getFloat(5) == 15f)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("served quantized: coarse pass scans only the 8-byte code column") {
    val p = plan("vs_quantized_served")
    assert(p.contains("struct<offset_id:bigint,code:array<bigint>>"),
      "coarse phase must scan the persisted code table, not embeddings\n" + p.take(1200))
    assert(p.contains("BroadcastHashJoin"),
      "survivors must broadcast into the embedding re-rank join\n" + p.take(800))
    assert(p.contains("partial_topkagg"), p.take(800))
  }

  test("served rotated: coarse pass scans only the code+correction table") {
    val p = plan("vs_quantized_rotated_served")
    // cosine's coarse key needs code+corr only — pruning drops vnorm too
    assert(p.contains("struct<offset_id:bigint,code:array<bigint>,corr:double>"),
      "coarse phase must scan the persisted rotated-code table, not embeddings\n" +
        p.take(1200))
    assert(p.contains("BroadcastHashJoin"),
      "survivors must broadcast into the embedding re-rank join\n" + p.take(800))
    assert(p.contains("partial_topkagg"), p.take(800))
  }

  test("sql-registered kernels: spark.sql text plans the codegen expression") {
    val p = plan("vs_sql_knn")
    // resolved through the injected FunctionRegistry entry; the planned
    // expression prints under its prettyName
    assert(p.contains("cosine_similarity("), p.take(800))
    assert(!p.toLowerCase.contains("batchevalpython"))
  }

  test("facade read: offset assignment has no single-partition Exchange") {
    // offset_id is assigned via range-repartition + zipWithIndex partition
    // bases — a global Window.orderBy would plan Exchange SinglePartition
    // and funnel the whole un-compacted tail through one task.
    val root = java.nio.file.Files.createTempDirectory("graft_plan_facade").toString
    val client = new graft.api.Client(spark, root)
    val coll = client.createCollection("p")
    import spark.implicits._
    coll.add(Seq(("a", "x"), ("b", "y")).toDF("id", "document"))
    val p = coll.asCollection.records.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p.take(1200))
    assert(!p.contains("Window"), "no global window in the facade read plan")
    // the post-zipWithIndex plan above cannot see upstream of the RDD
    // boundary — also inspect the offset-assignment INPUT plan (the
    // sorted frame the boundary consumes)
    val pre = coll.offsetSortedState.queryExecution.executedPlan.toString
    assert(!pre.contains("SinglePartition"), pre.take(1200))
    assert(!pre.contains("Window"), "no global window upstream of the boundary")
  }

  test("paged export: range exchange + local sort, no global sort and no " +
      "single-partition funnel per page") {
    // the page walk's order comes from ONE range repartition with
    // partition-local sorts + per-partition cursors — Limit{offset,limit}
    // paging would re-plan a global sort per page
    val coll = graft.queries.ChromaCore.docsCollection(spark, sf)
    val pre = coll.pagedExportSorted(coll.records)
      .queryExecution.executedPlan.toString
    assert(pre.toLowerCase.contains("rangepartitioning"),
      "ordered partitions must come from a range exchange\n" + pre.take(800))
    assert(!pre.contains("SinglePartition"),
      "no single-partition funnel in the export plan\n" + pre.take(800))
    // the full walk (post-cursor) is page-complete and ordered
    val walk = coll.pagedExport(pageSize = 64)
      .select(org.apache.spark.sql.functions.col("page"),
        org.apache.spark.sql.functions.col("id")).collect()
    val byPage = walk.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val maxPage = byPage.keys.max
    assert((0L until maxPage).forall(byPage(_) == 64),
      s"every page but the last must hold exactly pageSize rows: $byPage")
    assert(byPage(maxPage) >= 1 && byPage(maxPage) <= 64)
  }

  test("paged export under filters == the ordered scan's chunking, for " +
      "assorted pageSizes") {
    import graft.model.Where._
    val coll = graft.queries.ChromaCore.docsCollection(spark, sf)
    val cases: Seq[(Option[Expr], Int)] = Seq(
      (None, 7),
      (Some(Cmp("lang", "$eq", VStr("en"))), 33),
      (Some(Cmp("n_chars", "$gte", VInt(200))), 64),
      (Some(And(Seq(Cmp("lang", "$ne", VStr("zh")),
        Cmp("par", "$lt", VInt(7))))), 11))
    for ((w, ps) <- cases) {
      // oracle: the ordered Get scan, chunked driver-side
      val ordered = coll.get(where = w, include = Seq())
        .select(org.apache.spark.sql.functions.col("id"))
        .collect().map(_.getString(0))
      val expected = ordered.zipWithIndex
        .map { case (id, i) => id -> (i / ps).toLong }.toMap
      val walked = coll.pagedExport(ps, w)
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("page"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(walked == expected,
        s"page walk diverged from the ordered scan for where=$w ps=$ps " +
          s"(first diffs: ${(walked.toSet -- expected.toSet).take(3)})")
    }
  }

  test("span/substring dedup: first-occurrence mark plans NO window operator") {
    // the skew-safe contract (Dedup.markFirst): a window function over a
    // hot segment/window value cannot be AQE-skew-split, so the mark must
    // stay an aggregate+join — this pins any regression back to windows.
    // (substringReconstruct's per-doc span window is fine: doc_id keys.)
    val prev = spark.conf.get("spark.sql.maxToStringFields", "25")
    spark.conf.set("spark.sql.maxToStringFields", "10000") // no elided text
    try for (q <- Seq("dd_span_dedup", "dd_substring_dedup")) {
      val p = plan(q)
      val winPartitions = "windowspecdefinition\\(([a-z0-9_]+)#".r
        .findAllMatchIn(p.toLowerCase).map(_.group(1)).toSet
      // a Window operator whose spec the regex failed to parse is a bug
      // in this test, not a pass
      assert(!p.toLowerCase.contains("windowspecdefinition") ||
        winPartitions.nonEmpty,
        s"$q plan has a window the gate could not parse:\n${p.take(1500)}")
      assert(winPartitions.subsetOf(Set("doc_id")),
        s"$q marks firsts with a window over ${winPartitions -- Set("doc_id")}")
    } finally spark.conf.set("spark.sql.maxToStringFields", prev)
  }
}
