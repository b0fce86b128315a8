package graft.queries

import graft.Tables
import graft.operators.Materialize
import graft.operators.Materialize.LogOp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path semantics (`add/update/upsert/delete` → WAL → materialize →
  * compacted segment — SURVEY §3.4) driven through a deterministic
  * synthetic WAL derived from the `documents` table.
  *
  * The WAL exercises every transition of `operation.rs:16-34`:
  * {{{
  *   +0 Add     every doc            (AddNew)
  *   +1 Update  doc_id%3==0          (UpdateExisting: merge `source` key)
  *   +2 Delete  doc_id%7==0          (DeleteExisting)
  *   +3 Add     doc_id%21==0         (OverwriteExisting: add-after-delete)
  *   +4 Upsert  doc_id%10==0         (full replace, doc + meta)
  *   +5 Add     doc_id%9==0          (duplicate Add → must be ignored;
  *                                    every %9∩deleted id is %21 ⊂ re-added,
  *                                    so these all hit live records)
  * }}}
  *
  * The DuckDB oracle spells out the expected final state as a CASE over the
  * op precedence — a hash match proves the fold applies ops in log-offset
  * order with the right per-op semantics.
  */
object WritePath extends QueryPack {

  /** The synthetic WAL as a typed Dataset. */
  def syntheticWal(s: SparkSession, d: String) = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val base = docs.select(
      concat(lit("doc-"), col("doc_id")).as("id"),
      (col("doc_id") * 10).as("log_offset"),
      lit("Add").as("op"),
      col("text").as("document"),
      map(lit("lang"), col("lang")).as("meta"))
    val upd = docs.filter(col("doc_id") % 3 === 0).select(
      concat(lit("doc-"), col("doc_id")).as("id"),
      (col("doc_id") * 10 + 1).as("log_offset"),
      lit("Update").as("op"),
      lit(null).cast("string").as("document"),
      map(lit("source"), col("source")).as("meta"))
    val del = docs.filter(col("doc_id") % 7 === 0).select(
      concat(lit("doc-"), col("doc_id")).as("id"),
      (col("doc_id") * 10 + 2).as("log_offset"),
      lit("Delete").as("op"),
      lit(null).cast("string").as("document"),
      map_from_arrays(array(), array()).cast("map<string,string>").as("meta"))
    val readd = docs.filter(col("doc_id") % 21 === 0).select(
      concat(lit("doc-"), col("doc_id")).as("id"),
      (col("doc_id") * 10 + 3).as("log_offset"),
      lit("Add").as("op"),
      concat(lit("readded "), col("text")).as("document"),
      map(lit("lang"), col("lang")).as("meta"))
    val upsert = docs.filter(col("doc_id") % 10 === 0).select(
      concat(lit("doc-"), col("doc_id")).as("id"),
      (col("doc_id") * 10 + 4).as("log_offset"),
      lit("Upsert").as("op"),
      lit("upserted").as("document"),
      map(lit("v"), lit("2")).as("meta"))
    val dupAdd = docs.filter(col("doc_id") % 9 === 0).select(
      concat(lit("doc-"), col("doc_id")).as("id"),
      (col("doc_id") * 10 + 5).as("log_offset"),
      lit("Add").as("op"),
      lit("dup should be ignored").as("document"),
      map_from_arrays(array(), array()).cast("map<string,string>").as("meta"))
    base.union(upd).union(del).union(readd).union(upsert).union(dupAdd)
      .withColumn("embedding", lit(null).cast("array<float>"))
      .as[LogOp]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wp_materialize_lww" -> { (s, d) =>
      val live = Materialize(s, syntheticWal(s, d))
      live.toDF()
        .select(col("id"), col("document"),
          element_at(col("meta"), "lang").as("lang"),
          element_at(col("meta"), "source").as("source"),
          element_at(col("meta"), "v").as("v"))
        .orderBy(col("id"))
    },

    // Same fold, but on top of a pre-existing "compacted segment":
    // segment holds every doc; the log holds only the later ops. Proves
    // the segment-as-pseudo-log path (SourceRecordSegment rebuild).
    "wp_materialize_over_segment" -> { (s, d) =>
      import s.implicits._
      val wal = syntheticWal(s, d)
      val segment = Materialize(s, wal.filter(o => o.log_offset % 10 == 0)) // Adds only
      val tail = wal.filter(o => o.log_offset % 10 != 0)
      Materialize(s, tail, Some(Materialize.segmentAsLog(s, segment)))
        .toDF()
        .select(col("id"), col("document"),
          element_at(col("meta"), "lang").as("lang"),
          element_at(col("meta"), "source").as("source"),
          element_at(col("meta"), "v").as("v"))
        .orderBy(col("id"))
    },

    // Same semantics, DataFrame-native expression fold (no typed lambdas,
    // codegen end-to-end) — Materialize.applyDf.
    "wp_materialize_dfagg" -> { (s, d) =>
      Materialize.applyDf(syntheticWal(s, d).toDF())
        .select(col("id"), col("document"),
          element_at(col("meta"), "lang").as("lang"),
          element_at(col("meta"), "source").as("source"),
          element_at(col("meta"), "v").as("v"))
        .orderBy(col("id"))
    },

    // Predicate delete through the user-facing Writer: bulk-add every
    // doc (one distributed WAL batch, no driver round-trip),
    // delete(where = lang=de OR document contains 'sort merge'), flush —
    // the surviving state must equal the oracle's NOT(predicate) scan.
    "wp_delete_where" -> { (s, d) =>
      import graft.model.Where._
      import s.implicits._
      val w = graft.api.Writer.empty(s)
      w.addBatch(Tables.documents(s, d).select(
        concat(lit("doc-"), $"doc_id").as("id"),
        $"text".as("document"),
        map(lit("lang"), $"lang").as("meta")))
      w.deleteWhere(Or(Seq(
        Cmp("lang", "$eq", VStr("de")),
        DocContains("sort merge", negated = false))))
      w.flush().toDF()
        .select($"id", $"document",
          element_at($"meta", "lang").as("lang"))
        .orderBy($"id")
    },

    // The reference DeleteRequest's three separate filter fields —
    // ids, where, where_document — conjoined through the client handle
    // (`rust/types/src/api_types.rs` DeleteRequest): only records
    // matching ALL THREE disappear; everything else survives the WAL
    // fold untouched.
    "wp_delete_request" -> { (s, d) =>
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_delr_q").toString
      val client = new graft.api.Client(s, root)
      val coll = client.createCollection("delreq")
      coll.add(Tables.documents(s, d).select(
        concat(lit("doc-"), $"doc_id").as("id"),
        $"text".as("document"),
        map(lit("lang"), $"lang").as("meta")))
      coll.delete(
        ids = Some((0 to 300).map(i => s"doc-$i")),
        where = Some(graft.model.Where.Cmp("lang", "$eq",
          graft.model.Where.VStr("en"))),
        whereDocument = Some(graft.model.Where.DocContains("data",
          negated = false)))
      coll.get(include = Seq("document", "meta:lang"), limit = Some(100000))
        .orderBy($"id")
    },

    // Collection fork (copy-on-write, `service_based_frontend.rs:
    // 1663-1787`): the compacted segment is persisted ONCE and both
    // branches read the same immutable files; parent and fork diverge
    // only in their WAL tails (parent applies the standard tail, the
    // fork deletes doc_id%5 and upserts doc_id%4). The full-outer diff
    // of the two materialized states proves neither branch's writes
    // leaked into the other.
    "wp_fork_cow" -> { (s, d) =>
      val wal = syntheticWal(s, d).toDF()
      val root = graft.sources.CollectionStore.indexRoot(d) + "/fork_demo"
      graft.sources.CollectionStore.ensureBuilt(root, "segment", "adds-v2") {
        graft.sources.CollectionStore.saveRecords(
          Materialize.applyDf(wal.filter(col("log_offset") % 10 === 0)),
          s"$root/segment")
      }
      val seg = s.read.parquet(s"$root/segment/records")
      val parent = Materialize.compactionMerge(
        seg, wal.filter(col("log_offset") % 10 =!= 0))
      val docs = Tables.documents(s, d)
      val forkDel = docs.filter(col("doc_id") % 5 === 0).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        (col("doc_id") * 10 + 1).as("log_offset"),
        lit("Delete").as("op"),
        lit(null).cast("string").as("document"),
        map_from_arrays(array(), array()).cast("map<string,string>").as("meta"))
      val forkUps = docs.filter(col("doc_id") % 4 === 0).select(
        concat(lit("doc-"), col("doc_id")).as("id"),
        (col("doc_id") * 10 + 2).as("log_offset"),
        lit("Upsert").as("op"),
        lit("forked").as("document"),
        map(lit("branch"), lit("fork")).as("meta"))
      val fork = Materialize.compactionMerge(seg, forkDel.union(forkUps))
      parent.select(col("id"), col("document").as("parent_doc")).alias("p")
        .join(fork.select(col("id"), col("document").as("fork_doc")).alias("f"),
          Seq("id"), "full_outer")
        .select(col("id"), col("parent_doc"), col("fork_doc"),
          col("parent_doc").isNotNull.as("in_parent"),
          col("fork_doc").isNotNull.as("in_fork"))
        .orderBy(col("id"))
    },

    // Time-travel reads over the versioned store: two compactions
    // publish v1 and v2 through the conditional-commit path, then BOTH
    // versions serve simultaneously via atVersion — v1 must still show
    // the pre-upsert/pre-delete state after v2 lands (immutable
    // snapshot), v2 the post state. The build runs once (version
    // markers persist); re-runs measure pure versioned reads.
    "wp_time_travel" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/travel_client"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("tt")
      val docs = Tables.documents(s, d)
      def recs(pred: org.apache.spark.sql.Column, doc: org.apache.spark.sql.Column) =
        docs.filter(pred).select(
          concat(lit("doc-"), col("doc_id")).as("id"), doc.as("document"))
      if (graft.sources.CollectionStore.listVersions(coll.ref.dataRoot).isEmpty) {
        coll.add(recs(col("doc_id") < 100, col("text")))
        coll.persist() // v1
        val h2 = client.getCollection("tt")
        h2.upsert(recs(col("doc_id") < 100 && col("doc_id") % 3 === 0,
          concat(col("text"), lit(" v2"))))
        h2.delete((0 until 100 by 7).map(i => s"doc-$i"))
        h2.add(recs(col("doc_id").between(100, 119), col("text")))
        h2.persist() // v2
      }
      val h = client.getCollection("tt")
      val out = Seq(1L, 2L).map { v =>
        h.atVersion(v).records
          .select(lit(v).as("version"), col("id"), col("document"))
      }.reduce(_ union _)
      out.orderBy(col("version"), col("id"))
    },

    // Durable multi-writer WAL (WalStore): writer 1 commits an add batch
    // as log entry 1, a SECOND handle commits an upsert+delete batch as
    // entry 2, neither compacts — the read below is pure crash
    // recovery: a fresh handle replays the committed entries over an
    // empty segment in entry order. Re-runs skip the build (entries
    // persist) and measure replay + read only.
    "wp_wal_durable" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/wal_client"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("wl")
      val docs = Tables.documents(s, d)
      if (graft.sources.WalStore.publishedAfter(coll.ref.dataRoot, 0L).isEmpty) {
        coll.add(docs.filter(col("doc_id") < 80).select(
          concat(lit("doc-"), col("doc_id")).as("id"),
          col("text").as("document")))
        coll.commitLog() // entry 1
        val h2 = client.getCollection("wl")
        h2.upsert(docs.filter(col("doc_id") < 80 && col("doc_id") % 4 === 0)
          .select(concat(lit("doc-"), col("doc_id")).as("id"),
            concat(col("text"), lit(" walv2")).as("document")))
        h2.delete((0 until 80 by 9).map(i => s"doc-$i"))
        h2.commitLog() // entry 2 (folds entry 1, claims the next slot)
      }
      val fresh = client.getCollection("wl") // replays entries 1-2
      fresh.get(include = Seq("document"))
        .select(col("id"), col("document")).orderBy(col("id"))
    },

    // Conditional commit — the reference's optimistic id-scoped
    // transactions (`service_based_frontend.rs:1859-1990`): a
    // transaction whose read or write ids were touched after its
    // observed offset REJECTS (tx1, stomped on a read id), a clean one
    // commits (tx2). The oracle spells out the final state: tx1's
    // buffered updates must be absent, tx2's present — including on the
    // overlap id where tx2's later entry LWW-beats the interloper.
    "wp_conditional_commit" -> { (s, d) =>
      val root = graft.sources.CollectionStore.indexRoot(d) + "/tx_client"
      val client = new graft.api.Client(s, root)
      val coll = client.getOrCreateCollection("txc")
      val docs = Tables.documents(s, d)
      if (graft.sources.WalStore.publishedAfter(coll.ref.dataRoot, 0L).isEmpty) {
        coll.add(docs.filter(col("doc_id") < 60).select(
          concat(lit("doc-"), col("doc_id")).as("id"),
          col("text").as("document")))
        coll.commitLog() // entry 1
        val tx1 = coll.beginTransaction()
        tx1.get((0 until 60 by 5).map(i => s"doc-$i")) // reads incl. doc-5
        tx1.update(docs.filter(col("doc_id") < 60 && col("doc_id") % 5 === 0)
          .select(concat(lit("doc-"), col("doc_id")).as("id"),
            concat(col("text"), lit(" tx1")).as("document")))
        // interloper touches a read id and serializes first — entry 2
        val h2 = client.getCollection("txc")
        h2.upsert(docs.filter(col("doc_id") === 5)
          .select(concat(lit("doc-"), col("doc_id")).as("id"),
            concat(col("text"), lit(" stomped")).as("document")))
        h2.commitLog()
        require(tx1.commit().isLeft,
          "tx1 read doc-5 — the stomp must reject it")
        // tx2 observes entry 2, so its window is clean — entry 3
        val tx2 = coll.beginTransaction()
        tx2.update(docs.filter(col("doc_id") < 60 && col("doc_id") % 7 === 3)
          .select(concat(lit("doc-"), col("doc_id")).as("id"),
            concat(col("text"), lit(" tx2")).as("document")))
        require(tx2.commit().isRight, "tx2's window is clean — must commit")
      }
      val fresh = client.getCollection("txc") // replays entries 1-3
      fresh.get(include = Seq("document"))
        .select(col("id"), col("document")).orderBy(col("id"))
    },

    // The 100-TB compaction shape: huge segment + small WAL tail merged
    // with ZERO segment-side shuffles (broadcast ops join; see
    // Materialize.compactionMerge + CompactionMergeSpec plan gates).
    "wp_compaction_merge" -> { (s, d) =>
      val wal = syntheticWal(s, d).toDF()
      val segment = Materialize.applyDf(wal.filter(col("log_offset") % 10 === 0))
      val tail = wal.filter(col("log_offset") % 10 =!= 0)
      Materialize.compactionMerge(segment, tail)
        .select(col("id"), col("document"),
          element_at(col("meta"), "lang").as("lang"),
          element_at(col("meta"), "source").as("source"),
          element_at(col("meta"), "v").as("v"))
        .orderBy(col("id"))
    },
  )

  private val expectedStateSql =
    """SELECT 'doc-'||doc_id AS id,
      |  CASE WHEN doc_id%10=0 THEN 'upserted'
      |       WHEN doc_id%21=0 THEN 'readded '||text
      |       ELSE text END AS document,
      |  CASE WHEN doc_id%10=0 THEN NULL ELSE lang END AS lang,
      |  CASE WHEN doc_id%10=0 THEN NULL
      |       WHEN doc_id%21=0 THEN NULL
      |       WHEN doc_id%3=0 THEN source
      |       ELSE NULL END AS source,
      |  CASE WHEN doc_id%10=0 THEN '2' ELSE NULL END AS v
      |FROM documents
      |WHERE NOT (doc_id%7=0 AND doc_id%21<>0 AND doc_id%10<>0)
      |ORDER BY id""".stripMargin

  val oracle: Map[String, String] = Map(
    "wp_materialize_lww" -> expectedStateSql,
    "wp_materialize_over_segment" -> expectedStateSql,
    "wp_materialize_dfagg" -> expectedStateSql,
    "wp_compaction_merge" -> expectedStateSql,

    "wp_delete_where" ->
      """SELECT 'doc-'||doc_id AS id, text AS document, lang FROM documents
        |WHERE NOT (lang = 'de' OR contains(text, 'sort merge'))
        |ORDER BY id""".stripMargin,

    "wp_delete_request" ->
      """SELECT 'doc-'||doc_id AS id, text AS document, lang FROM documents
        |WHERE NOT (doc_id <= 300 AND lang = 'en' AND contains(text, 'data'))
        |ORDER BY id""".stripMargin,

    "wp_wal_durable" ->
      """SELECT 'doc-'||doc_id AS id,
        |       CASE WHEN doc_id%4=0 THEN text||' walv2' ELSE text END
        |         AS document
        |FROM documents
        |WHERE doc_id < 80 AND doc_id%9 <> 0
        |ORDER BY id""".stripMargin,

    // tx1 (ids %5, ' tx1') rejected — absent everywhere. The
    // interloper's doc-5 stomp (entry 2) survives; tx2 (ids %7=3,
    // ' tx2') committed as entry 3.
    "wp_conditional_commit" ->
      """SELECT 'doc-'||doc_id AS id,
        |       CASE WHEN doc_id%7=3 THEN text||' tx2'
        |            WHEN doc_id=5 THEN text||' stomped'
        |            ELSE text END AS document
        |FROM documents
        |WHERE doc_id < 60
        |ORDER BY id""".stripMargin,

    "wp_time_travel" ->
      """WITH v1 AS (SELECT 1 AS version, 'doc-'||doc_id AS id,
        |             text AS document
        |           FROM documents WHERE doc_id < 100),
        |v2 AS (SELECT 2 AS version, 'doc-'||doc_id AS id,
        |         CASE WHEN doc_id%3=0 THEN text||' v2' ELSE text END AS document
        |       FROM documents WHERE doc_id < 100 AND doc_id%7<>0
        |       UNION ALL
        |       SELECT 2, 'doc-'||doc_id, text
        |       FROM documents WHERE doc_id BETWEEN 100 AND 119)
        |SELECT version, id, document
        |FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        |ORDER BY version, id""".stripMargin,

    "wp_fork_cow" ->
      """WITH p AS (SELECT 'doc-'||doc_id AS id,
        |             CASE WHEN doc_id%10=0 THEN 'upserted'
        |                  WHEN doc_id%21=0 THEN 'readded '||text
        |                  ELSE text END AS parent_doc
        |           FROM documents
        |           WHERE NOT (doc_id%7=0 AND doc_id%21<>0 AND doc_id%10<>0)),
        |f AS (SELECT 'doc-'||doc_id AS id,
        |        CASE WHEN doc_id%4=0 THEN 'forked' ELSE text END AS fork_doc
        |      FROM documents
        |      WHERE doc_id%5<>0 OR doc_id%4=0)
        |SELECT coalesce(p.id, f.id) AS id, p.parent_doc, f.fork_doc,
        |  p.id IS NOT NULL AS in_parent, f.id IS NOT NULL AS in_fork
        |FROM p FULL OUTER JOIN f ON p.id = f.id
        |ORDER BY id""".stripMargin,
  )
}
