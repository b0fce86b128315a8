package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Server-side named functions bound to collections — the reference's
  * attached functions (`rust/frontend/src/impls/service_based_frontend.rs:
  * 3208-3460`: register by name, executor runs them over the collection,
  * outputs live beside it; accumulators in
  * `rust/worker/src/execution/functions/statistics.rs`). Here a function
  * is records-DataFrame → small output DataFrame, so it composes into one
  * Catalyst plan over the live state; the streaming face (incremental
  * catch-up by completion offset) is the same aggregation run under
  * Structured Streaming (`st_sessionize_stateful` shape).
  */
object AttachedFunctions {

  trait AttachedFunction {
    def name: String
    /** records in the standard shredded schema → output table */
    def apply(records: DataFrame): DataFrame
    /** Optional side-channel the reference's async file functions use
      * (count_to_file_async writes its state to a storage path beside
      * the output records) — called once per invocation with the raw
      * function output.
      */
    def writeAside(out: DataFrame): Unit = ()
  }

  /** The reference's count function (`CountAttachedFunction`,
    * `rust/worker/src/execution/operators/execute_task.rs:30-95`): ONE
    * output record with the fixed id `function_output` carrying the
    * live record count under the `total_count` metadata key — its
    * exact output shape, so a user reading the output collection by
    * that id sees what the reference serves.
    */
  object RecordCount extends AttachedFunction {
    val name = "record_count"
    def apply(records: DataFrame): DataFrame =
      records.agg(count(lit(1)).as("total_count"))
        .select(lit("function_output").as("id"), col("total_count"))
  }

  /** Token-frequency statistic: global top-10 document tokens by
    * (count desc, token asc) — the TokenFreqAgg accumulator shape as a
    * two-phase partial aggregation.
    */
  object TokenStats10 extends AttachedFunction {
    val name = "token_stats_10"
    def apply(records: DataFrame): DataFrame =
      records
        .select(explode(graft.operators.TextStats.tokens(col("document"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("term")).limit(10)
  }

  /** Log-consuming attached functions — the reference's
    * revision-history family reads the MATERIALIZED LOG, not the folded
    * state, and appends incrementally, resuming from state rows it
    * keeps in its own output collection (`revision_history.rs`
    * RevisionTracker loads `max_version` from the output reader).
    * Invocation feeds the inputs' retained durable ops plus the output
    * collection's current records, and the returned rows UPSERT without
    * the snapshot path's full-refresh tombstone sweep — history is
    * append-only.
    */
  trait LogAttachedFunction extends AttachedFunction {
    /** ops: `LogOp` rows (id, log_offset, op, document, meta);
      * existing: the output collection's current records. Returns
      * record-shaped rows (id, document, meta, meta_int, meta_float,
      * meta_bool) ready to upsert.
      */
    def applyOps(ops: DataFrame, existing: DataFrame): DataFrame
    final def apply(records: DataFrame): DataFrame =
      throw new UnsupportedOperationException(
        s"$name consumes the log — invoke feeds it ops, not state")
  }

  /** One incoming op for the revision fold: the source record's id, its
    * durable position, the op kind, payload, raw WAL metadata, the
    * app-declared source version (decoded from the `version_key`
    * metadata), and the id's persisted tracker state (None on first
    * sight).
    */
  final case class RhOp(oid: String, log_offset: Long, op: String,
      document: Option[String], meta: Map[String, String],
      source_ver: Option[Long], base_version: Option[Long],
      base_offset: Option[Long], gen_pos: Option[Long],
      gen_sv: Option[Long])

  /** One fold output row — a revision (`is_tracker = false`) or the
    * id's updated `::v0` tracker.
    */
  final case class RhEmit(id: String, oid: String, is_tracker: Boolean,
      version: Long, log_offset: Long, is_delete: Boolean,
      document: Option[String], meta: Map[String, String],
      max_version: Long, gen_pos: Long, gen_sv: Long, max_offset: Long,
      source_ver: Option[Long])

  /** The reference's `revision_history` function
    * (`rust/worker/src/execution/functions/revision_history.rs`): every
    * durable mutation of a source record becomes an immutable revision
    * record `{original_id}::v{version}` in the output collection,
    * deletes producing tombstone revisions (`is_delete: true`, no
    * document), and a `{original_id}::v0` tracker row carrying the
    * RevisionTracker state (revision_history.rs:91-132) — `max_version`
    * plus the GENERATION mapping (`generation_start_pos`,
    * `generation_start_source_ver`) and the engine's consumed-offset
    * high-water mark, the incremental-resume state the reference loads
    * from its output reader.
    *
    * Version assignment is the reference's, line for line
    * (`next_version_for_source` / `next_version_fallback`,
    * revision_history.rs:143-169): an op carrying the `version_key`
    * metadata (param, default `version`) maps deterministically to
    * `generation_start_pos + (source_version −
    * generation_start_source_ver)`; a source version BELOW the current
    * generation's expected maximum starts a NEW generation (the
    * delete-then-recreate resurrection, `is_new_generation`), and an
    * effective version at or below `max_version` is an
    * already-archived replay and emits nothing (idempotent
    * re-compaction). Ops without the key — and deletes — take the
    * `max_version + 1` fallback.
    *
    * Revision metadata = {original_id, version, log_offset, is_delete
    * [, source_version]} merged over the op's decoded typed metadata
    * (reserved keys win, `RevisionMetadata::into_update_metadata`).
    * Not carried: `archived_at` wall-clock (nondeterministic — the
    * deterministic `log_offset` serves the audit role) and the
    * tombstone's source_version+1 positioning (our delete ops carry no
    * metadata; the fallback still orders tombstones correctly by log
    * position).
    *
    * Shape: the per-id fold is inherently sequential and stateful, so
    * it runs as `groupByKey → flatMapGroups` — one task per id group,
    * state the size of one tracker, per-id op lists bounded by write
    * rate between invocations, never corpus-sized.
    */
  object RevisionHistory extends LogAttachedFunction {
    val name = "revision_history"
    private val Reserved =
      Seq("original_id", "version", "log_offset", "is_delete",
        "source_version", "max_version", "max_offset",
        "generation_start_pos", "generation_start_source_ver")

    def applyOps(ops: DataFrame, existing: DataFrame): DataFrame =
      applyOps(ops, existing, versionKey = "version")

    def applyOps(ops: DataFrame, existing: DataFrame,
        versionKey: String): DataFrame = {
      import graft.api.TypedMeta
      val spark = ops.sparkSession
      import spark.implicits._
      val trackers = existing.filter(col("id").endsWith("::v0"))
        .select(element_at(col("meta_str"), "original_id").as("oid"),
          element_at(col("meta_int"), "max_version").as("base_version"),
          element_at(col("meta_int"), "max_offset").as("base_offset"),
          element_at(col("meta_int"), "generation_start_pos")
            .as("gen_pos"),
          element_at(col("meta_int"), "generation_start_source_ver")
            .as("gen_sv"))
      val newOps = ops
        .select(col("id").as("oid"), col("log_offset"), col("op"),
          col("document"), col("meta"),
          element_at(TypedMeta.decodeInt(col("meta")), versionKey)
            .as("source_ver"))
        .join(trackers, Seq("oid"), "left")
        .filter(col("log_offset") > coalesce(col("base_offset"), lit(-1L)))
        .as[RhOp]
      val emitted = newOps.groupByKey(_.oid).flatMapGroups {
        (oid: String, it: Iterator[RhOp]) =>
          // Ops in one committed batch share an offset. A same-offset
          // same-id tie is always same-KIND too (Writer.addBatch stamps
          // one op kind per batch; singleton ops own their offsets), so
          // op-kind ordering can never archive a tombstone ahead of the
          // content revision it followed; source_ver + document complete
          // the key so duplicate-id batches fold DETERMINISTICALLY
          // rather than in shuffle-arrival order.
          val rows = it.toVector.sortBy(r =>
            (r.log_offset, r.op, r.source_ver.getOrElse(Long.MinValue),
              r.document.getOrElse("")))
          var maxV = rows.head.base_version.getOrElse(0L)
          var genPos = rows.head.gen_pos.getOrElse(0L)
          var genSv = rows.head.gen_sv.getOrElse(0L)
          var maxOff = rows.head.base_offset.getOrElse(-1L)
          val out = Vector.newBuilder[RhEmit]
          rows.foreach { r =>
            maxOff = math.max(maxOff, r.log_offset)
            val assigned: Option[Long] = r.source_ver match {
              case Some(sv) if r.op != "Delete" =>
                // next_version_for_source (revision_history.rs:143-161)
                val newGen = maxV == 0L ||
                  (sv < genSv + (maxV - genPos) &&
                    !(genPos == 0L && genSv == 0L))
                if (newGen) { genPos = maxV + 1; genSv = sv }
                val eff = genPos + (sv - genSv)
                if (eff <= maxV) None // already archived — idempotent
                else { maxV = eff; Some(eff) }
              case _ => // next_version_fallback
                maxV += 1; Some(maxV)
            }
            assigned.foreach { v =>
              out += RhEmit(s"$oid::v$v", oid, is_tracker = false, v,
                r.log_offset, r.op == "Delete",
                if (r.op == "Delete") None else r.document, r.meta,
                0L, 0L, 0L, 0L, r.source_ver)
            }
          }
          out += RhEmit(s"$oid::v0", oid, is_tracker = true, 0L, 0L,
            is_delete = false, None, Map.empty,
            maxV, genPos, genSv, maxOff, None)
          out.result()
      }.toDF()
      def keep(m: Column) =
        map_filter(m, (k, _) => !k.isin(Reserved.map(lit(_)): _*))
      val none = map_from_arrays(array(), array())
      val revRecords = emitted.filter(!col("is_tracker")).select(
        col("id"),
        col("document"),
        map_concat(map(lit("original_id"), col("oid")),
          keep(TypedMeta.decodeStr(col("meta")))).as("meta"),
        map_concat(
          map(lit("version"), col("version"),
            lit("log_offset"), col("log_offset")),
          when(col("source_ver").isNotNull,
            map(lit("source_version"), col("source_ver")))
            .otherwise(none.cast("map<string,bigint>")),
          keep(TypedMeta.decodeInt(col("meta")))).as("meta_int"),
        keep(TypedMeta.decodeFloat(col("meta"))).as("meta_float"),
        map_concat(map(lit("is_delete"), col("is_delete")),
          keep(TypedMeta.decodeBool(col("meta")))).as("meta_bool"))
      val newTrackers = emitted.filter(col("is_tracker")).select(
        col("id"),
        lit(null).cast("string").as("document"),
        map(lit("original_id"), col("oid")).as("meta"),
        map(lit("max_version"), col("max_version"),
          lit("max_offset"), col("max_offset"),
          lit("generation_start_pos"), col("gen_pos"),
          lit("generation_start_source_ver"), col("gen_sv"))
          .as("meta_int"),
        none.cast("map<string,double>").as("meta_float"),
        none.cast("map<string,boolean>").as("meta_bool"))
      revRecords.unionByName(newTrackers)
    }
  }

  /** `http_generate` (`rust/worker/src/execution/functions/
    * http_generate.rs`): ship record batches to an external generation
    * service — POST `{endpoint}/generate` with
    * `{"record_sets": [{"records": [{id, document, metadata}, …]}]}` →
    * `{"call_id": …}`, then poll GET `{endpoint}/status/{call_id}` with
    * capped exponential backoff until `success` (an error status fails
    * loudly, `poll_until_done` http_generate.rs:199-275). Shipping is
    * DISTRIBUTED: each input partition chunks to `batch_size`
    * (http_generate.rs:23 default bound) and runs its own spawn/poll,
    * so egress scales with the cluster, never through the driver. The
    * reference's service writes the generated records into the output
    * collection itself; in-container the per-job receipts
    * {call_id, records, status} land there instead, keeping the spawn/
    * poll protocol real and auditable against a local HTTP fixture
    * (the HttpConditionalStore testing pattern). Typed metadata ships
    * string-rendered in the JSON.
    */
  final class HttpGenerate(endpoint: String, batchSize: Int,
      pollMs: Long, timeoutMs: Long) extends AttachedFunction {
    val name = "http_generate"
    def apply(records: DataFrame): DataFrame = {
      val spark = records.sparkSession
      import spark.implicits._
      def strMap(c: String): Column =
        if (records.columns.contains(c))
          transform_values(coalesce(col(c),
            map_from_arrays(array(), array()).cast(records.schema(c).dataType)),
            (_, v) => v.cast("string"))
        else map_from_arrays(array(), array()).cast("map<string,string>")
      val payloads = records.select(to_json(struct(
        col("id"), col("document"),
        map_concat(strMap("meta_str"), strMap("meta_int"),
          strMap("meta_float"), strMap("meta_bool")).as("metadata")))
        .as("rec")).as[String]
      val (ep, bs, pm, tm) = (endpoint, batchSize, pollMs, timeoutMs)
      // EAGER collect of the tiny receipt set (one row per spawned job,
      // bounded by partitions × chunks): the POSTs must fire exactly
      // once, not once per downstream action on a lazy plan
      val receipts = payloads.mapPartitions { it =>
        it.grouped(bs).map { chunk =>
          val body =
            s"""{"record_sets":[{"records":[${chunk.mkString(",")}]}]}"""
          val callId = AttachedFunctions.httpSpawn(ep, body)
          AttachedFunctions.httpPollStatus(ep, callId, pm, tm)
          (callId, chunk.size.toLong, "success")
        }
      }.collect()
      receipts.toSeq.toDF("call_id", "records", "status")
        .orderBy(col("call_id"))
    }
  }

  /** `http_currents` (`rust/worker/src/execution/functions/
    * http_currents.rs`): a TRIGGER-style job — no records ship; POST
    * `{endpoint}/currents` tells the service to refresh the "currents"
    * view for this instance's output collection
    * (`CurrentsRequest{output_collection, database_name}` — the
    * executor takes the output name from the INSTANCE, not params,
    * http_currents.rs:124), authenticated by Modal proxy headers from
    * `MODAL_KEY`/`MODAL_SECRET` (env; JVM system properties accepted
    * as an in-container test fallback — System.getenv is immutable
    * inside a running JVM), then the same `/status/{call_id}` poll
    * loop as http_generate. Exactly ONE input collection is legal
    * (`validate_input_batch_count`, http_currents.rs:84-90). The
    * receipt row is the output-collection audit record.
    */
  final class HttpCurrents(endpoint: String, databaseName: String,
      outputCollection: String, pollMs: Long, timeoutMs: Long)
      extends AttachedFunction {
    val name = "http_currents"
    private def cred(k: String): String =
      sys.env.get(k).orElse(sys.props.get(k)).getOrElse(
        throw new IllegalArgumentException(s"missing env var $k"))
    // resolve-time: auth must be present at attach, not first run
    private val modalKey = cred("MODAL_KEY")
    private val modalSecret = cred("MODAL_SECRET")
    def apply(records: DataFrame): DataFrame = {
      val spark = records.sparkSession
      import spark.implicits._
      val body = s"""{"output_collection":"$outputCollection",""" +
        s""""database_name":"$databaseName"}"""
      val callId = httpSpawn(endpoint, body, path = "currents",
        headers = Seq("Modal-Key" -> modalKey,
          "Modal-Secret" -> modalSecret))
      httpPollStatus(endpoint, callId, pollMs, timeoutMs)
      Seq((callId, "success")).toDF("call_id", "status")
    }
  }

  private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  private def callIdOf(body: String): String = {
    val j = org.json4s.jackson.JsonMethods.parse(body)
    (j \ "call_id") match {
      case org.json4s.JString(s) => s
      case o => throw new IllegalStateException(s"no call_id in $o")
    }
  }

  /** POST `{endpoint}/{path}`; non-2xx fails loudly like the
    * reference's spawns (http_generate.rs:154-196,
    * http_currents.rs:142-170).
    */
  private[functions] def httpSpawn(endpoint: String, body: String,
      path: String = "generate",
      headers: Seq[(String, String)] = Seq.empty): String = {
    var b = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"${endpoint.stripSuffix("/")}/$path"))
      .timeout(java.time.Duration.ofSeconds(30))
      .header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b = b.header(k, v) }
    val resp = http.send(
      b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"POST /$path returned ${resp.statusCode()}")
    callIdOf(resp.body())
  }

  /** GET `{endpoint}/status/{call_id}` until `success`; `failed`/
    * `error` throw with the service's message; anything else retries
    * with capped exponential backoff to the deadline
    * (http_generate.rs:199-275).
    */
  private[functions] def httpPollStatus(endpoint: String, callId: String,
      pollMs: Long, timeoutMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var interval = pollMs
    while (true) {
      val req = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(
            s"${endpoint.stripSuffix("/")}/status/$callId"))
        .timeout(java.time.Duration.ofSeconds(30)).GET().build()
      val resp = http.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) {
        val j = org.json4s.jackson.JsonMethods.parse(resp.body())
        (j \ "status") match {
          case org.json4s.JString("success") => return
          case org.json4s.JString(s)
              if s == "failed" || s == "error" =>
            val msg = (j \ "error") match {
              case org.json4s.JString(m) => m
              case _ => "unknown error"
            }
            throw new IllegalStateException(s"generation $callId: $msg")
          case _ => // pending — retry
        }
      }
      if (System.currentTimeMillis() > deadline)
        throw new java.util.concurrent.TimeoutException(
          s"generation $callId not done within ${timeoutMs} ms")
      Thread.sleep(interval)
      interval = math.min(interval * 2, pollMs * 8)
    }
  }

  /** `count_to_file_async` (`rust/worker/src/execution/functions/
    * count_to_file_async.rs`): maintains the live record count at a
    * storage path (`s3_path` param — a local/shared-fs path here, the
    * engine's storage plane). The reference folds AddNew/DeleteExisting
    * deltas with per-input pulled offsets; our invoke recomputes the
    * live count per run and overwrites, the same full-refresh contract
    * as the output-collection leg, writing the `{"count": N}` form its
    * reader accepts. Attachment is gated behind allow_reset
    * (`frontend-core/src/attached_function.rs:17`
    * ensure_function_attachment_allowed).
    */
  final class CountToFileAsync(path: String) extends AttachedFunction {
    val name = "count_to_file_async"
    require(path.nonEmpty && !path.startsWith("s3://"),
      s"invalid path: '$path' (no S3 endpoint in-container — use a " +
        "local/shared-fs path)")
    def apply(records: DataFrame): DataFrame =
      records.agg(count(lit(1)).as("n"))
        .select(lit("count").as("stat"), col("n"))
    override def writeAside(out: DataFrame): Unit = {
      val n = out.select(col("n")).collect()(0).getLong(0)
      val p = java.nio.file.Paths.get(path)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, s"""{"count":$n}""".getBytes("UTF-8"))
    }
  }

  /** Histogram over a string metadata key (absent key → bucket NULL). */
  final class MetaHistogram(key: String) extends AttachedFunction {
    val name = s"meta_histogram:$key"
    def apply(records: DataFrame): DataFrame =
      records.groupBy(element_at(col("meta_str"), key).as("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("value"))
  }

  /** NB quality scoring bound to the collection (the GPT-3 quality gate
    * as a server-side function): the target class is records whose
    * `meta_str[key] == value` (absent key = raw class — curated vs
    * everything else), the model fits on the LIVE records and scores
    * every record ([[graft.operators.TextStats.scoreWithNb]] self-score
    * shape). Output per record: (doc_id = record id, n_toks, logodds,
    * pred).
    */
  final class NbQuality(key: String, value: String) extends AttachedFunction {
    val name = s"nb_quality:$key=$value"
    def apply(records: DataFrame): DataFrame = {
      val docs = records.select(col("id").as("doc_id"),
        col("document").as("text"),
        coalesce(element_at(col("meta_str"), key) === value, lit(false))
          .as("is_target"))
      graft.operators.TextStats.nbQualityScore(docs,
        docs.select(col("doc_id"), col("text")))
    }
  }

  /** The reference's `statistics` attached function —
    * `rust/worker/src/execution/functions/statistics.rs`: per
    * (metadata key, typed value) frequency counts over the live
    * records, arrays expanding one count per element and sparse
    * vectors one per index (`StatisticsValue::from_metadata_value`,
    * statistics.rs:168-206), plus the `summary::s:total_count` row
    * counting live records. Output rows carry the reference's exact
    * record shape (statistics.rs:439-495): id
    * `<key>::<type_prefix>:<value_index>`, document
    * `statistics about <key> for <prefix>:<value_index>`, and
    * {count, key, type, value} metadata. Floats render in Rust's
    * `{:.16e}` form (`1.5000000000000000e0` — exponent unpadded,
    * no plus sign), reproduced with codegen'd format + regexp, no
    * UDF. One union-of-explodes → single groupBy count: every leg is
    * a map-side-combinable aggregation, output is
    * distinct-value-proportional.
    */
  object StatisticsFn extends AttachedFunction {
    val name = "statistics"

    /** Rust `{:.16e}`: Java's `%.16e` then strip the exponent's plus
      * sign and leading zeros (`e+00` → `e0`, `e-05` → `e-5`).
      */
    private def rustExp(v: Column): Column =
      regexp_replace(
        regexp_replace(format_string("%.16e", v), "e\\+0*(?=\\d)", "e"),
        "e-0*(?=\\d)", "e-")

    /** ONE pass over the records (guide §1.2): the old shape was a
      * union of up to nine per-column explode legs plus a separate
      * summary aggregate — ten scans of the live state, i.e. ten corpus
      * scans at compaction scale. Each row now builds its entry array
      * with codegen'd higher-order expressions (`transform`/`flatten`
      * over `map_entries`), a synthetic `summary` entry per row makes
      * the record count fall out of the same groupBy, and a single
      * explode + count produces byte-identical output.
      */
    private val entryType =
      "array<struct<k:string,type:string,pfx:string,value:string>>"

    def apply(records: DataFrame): DataFrame = {
      def entry(k: Column, tpe: String, pfx: String, v: Column): Column =
        struct(k.as("k"), lit(tpe).as("type"), lit(pfx).as("pfx"),
          v.cast("string").as("value"))
      def scalarEntries(c: String, pfx: String, tpe: String,
          render: Column => Column): Option[Column] =
        if (!records.columns.contains(c)) None
        else Some(transform(map_entries(col(c)), e =>
          entry(e.getField("key"), tpe, pfx, render(e.getField("value")))))
      // NULL-GUARD before the flatten: Spark's `flatten` returns null if
      // ANY nested element is null, so one null-valued map entry would
      // otherwise erase EVERY sibling key's entries on that row (the old
      // per-leg explode dropped only the null entry). Filtering the null
      // values first restores that semantics.
      def arrayEntries(c: String, pfx: String, tpe: String,
          render: Column => Column): Option[Column] =
        if (!records.columns.contains(c)) None
        else Some(flatten(transform(
          filter(map_entries(col(c)), e => e.getField("value").isNotNull),
          e => transform(e.getField("value"), el =>
            entry(e.getField("key"), tpe, pfx, render(el))))))
      val sparseEntries: Option[Column] =
        if (!records.columns.contains("meta_sparse")) None
        else Some(flatten(transform(
          filter(map_entries(col("meta_sparse")),
            e => e.getField("value").getField("indices").isNotNull),
          e => transform(e.getField("value").getField("indices"), ix =>
            entry(e.getField("key"), "sparse", "sv", ix.cast("string"))))))
      val pieces = (
        scalarEntries("meta_str", "s", "str", identity).toSeq ++
        scalarEntries("meta_int", "i", "int", _.cast("string")) ++
        scalarEntries("meta_float", "f", "float", rustExp) ++
        scalarEntries("meta_bool", "b", "bool", _.cast("string")) ++
        arrayEntries("meta_str_arr", "s", "str", identity) ++
        arrayEntries("meta_int_arr", "i", "int", _.cast("string")) ++
        arrayEntries("meta_float_arr", "f", "float", rustExp) ++
        arrayEntries("meta_bool_arr", "b", "bool", _.cast("string")) ++
        sparseEntries
      ).map(c => coalesce(c, array().cast(entryType))) // null map ⇒ no entries
      // every live record contributes one summary entry — the
      // `summary::s:total_count` row's count IS the record count
      val summaryEntry =
        array(entry(lit("summary"), "str", "s", lit("total_count")))
      val counted = records
        .select(explode(concat((pieces :+ summaryEntry): _*)).as("e"))
        .select(col("e.k").as("k"), col("e.type").as("type"),
          col("e.pfx").as("pfx"), col("e.value").as("value"))
        .groupBy("k", "type", "pfx", "value")
        .agg(count(lit(1)).as("count"))
      // an EMPTY collection still reports `summary::s:total_count` = 0
      // (the old global-aggregate leg did); the zero seed rides a
      // constant row and the re-aggregate is output-sized, not
      // corpus-sized
      val zeroSummary = records.sparkSession.range(1).select(
        lit("summary").as("k"), lit("str").as("type"), lit("s").as("pfx"),
        lit("total_count").as("value"), lit(0L).as("count"))
      counted.unionByName(zeroSummary)
        .groupBy("k", "type", "pfx", "value")
        .agg(sum(col("count")).as("count"))
        .select(
          concat(col("k"), lit("::"), col("pfx"), lit(":"), col("value"))
            .as("id"),
          format_string("statistics about %s for %s:%s",
            col("k"), col("pfx"), col("value")).as("document"),
          col("count"),
          col("k").as("key"), col("type"), col("value"))
    }
  }

  /** Map a function's output table into collection RECORDS for the
    * instance's output collection (the reference's attached functions
    * write their results as records into a dedicated output collection —
    * `attach_function`'s `output_collection`,
    * `rust/types/src/api_types.rs:2651`): the FIRST output column
    * renders as the record id (so it must be a key of the output —
    * every shipped function's leading column is), every remaining
    * column shreds by Spark type into the matching typed-metadata map
    * (int-like → `meta_int`, float-like → `meta_float`, boolean →
    * `meta_bool`, everything else stringifies into `meta_str`) —
    * except a column literally named `document`, which rides as the
    * record's document (the reference's statistics output sets one,
    * statistics.rs:447). A pure projection — no shuffle, no action;
    * NULL cells drop from their map rather than ride as null-valued
    * entries.
    */
  def toRecords(out: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val idCol = out.columns.head
    val hasDoc = out.columns.tail.contains("document")
    def fields = out.schema.fields.tail.filterNot(_.name == "document")
    def group(p: DataType => Boolean): Seq[String] =
      fields.collect { case f if p(f.dataType) => f.name }.toSeq
    val ints = group {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val floats = group {
      case FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    }
    val bools = group { case BooleanType => true; case _ => false }
    val strs = fields.map(_.name)
      .filterNot((ints ++ floats ++ bools).toSet).toSeq
    def metaMap(keys: Seq[String], cast: String) =
      if (keys.isEmpty)
        map_from_arrays(array(), array()).cast(s"map<string,$cast>")
      else map_filter(
        map(keys.flatMap(k => Seq(lit(k), col(k).cast(cast))): _*),
        (_, v) => v.isNotNull)
    out.select(
      coalesce(col(idCol).cast("string"), lit("null")).as("id"),
      (if (hasDoc) col("document").cast("string")
       else lit(null).cast("string")).as("document"),
      metaMap(ints, "long").as("meta_int"),
      metaMap(floats, "double").as("meta_float"),
      metaMap(bools, "boolean").as("meta_bool"),
      metaMap(strs, "string").as("meta"))
  }

  /** Resolve a registered function by name; `meta_histogram:<key>` and
    * `nb_quality:<key>=<value>` are parameterized families. The
    * parameterized families also resolve from their BARE id plus a
    * params map — the reference's functions read the attached
    * instance's stored params JSON at execution time
    * (`rust/worker/src/execution/functions/count_to_file_async.rs:73-78`
    * parses `af.params`), so `attach_function("meta_histogram",
    * params={"key": "lang"})` must configure the run, not ride along as
    * dead metadata. Missing required params reject HERE, which the
    * attach path calls — at attach, not first run, like every other
    * registration check.
    */
  /** Whether `functionId` resolves to a [[LogAttachedFunction]] — the
    * WAL-GC fence needs this WITHOUT instance params (resolve() rejects
    * missing required params, which a GC sweep has no business doing).
    * Keep in sync with [[resolve]]'s log-consuming cases.
    */
  def isLogConsuming(functionId: String): Boolean =
    functionId == RevisionHistory.name

  def resolve(name: String,
      params: Map[String, String] = Map.empty): AttachedFunction = {
    def need(k: String): String = params.getOrElse(k,
      throw new IllegalArgumentException(
        s"attached function '$name' requires params['$k']"))
    name match {
      case RecordCount.name => RecordCount
      // the reference's canonical id for the count function
      // (operators_generated.rs:13 FUNCTION_RECORD_COUNTER_NAME)
      case "record_counter" => RecordCount
      case TokenStats10.name => TokenStats10
      case StatisticsFn.name => StatisticsFn
      case RevisionHistory.name =>
        // version_key param overrides the reference's default `version`
        // metadata key (DEFAULT_VERSION_KEY, revision_history.rs:71)
        params.get("version_key").map { vk =>
          new LogAttachedFunction {
            val name = RevisionHistory.name
            def applyOps(o: DataFrame, e: DataFrame): DataFrame =
              RevisionHistory.applyOps(o, e, vk)
          }: AttachedFunction
        }.getOrElse(RevisionHistory)
      case "count_to_file_async" => new CountToFileAsync(need("s3_path"))
      case "http_generate" => new HttpGenerate(need("endpoint_url"),
        batchSize = params.getOrElse("batch_size", "500000").toInt,
        pollMs = params.getOrElse("poll_ms", "5000").toLong,
        timeoutMs = params.getOrElse("timeout_ms", "3600000").toLong)
      case "http_currents" =>
        // instance context rides sigil-keyed params the client injects
        // (the reference executor reads these off the AttachedFunction
        // row itself, http_currents.rs:84-124)
        require(params.getOrElse("#input_count", "1") == "1",
          "http_currents accepts exactly one input collection")
        new HttpCurrents(need("endpoint_url"), need("database_name"),
          outputCollection = params.getOrElse("#output_collection", ""),
          pollMs = params.getOrElse("poll_ms", "5000").toLong,
          timeoutMs = params.getOrElse("timeout_ms", "3600000").toLong)
      case "meta_histogram" => new MetaHistogram(need("key"))
      case h if h.startsWith("meta_histogram:") =>
        new MetaHistogram(h.stripPrefix("meta_histogram:"))
      case "nb_quality" => new NbQuality(need("key"), need("value"))
      case nb if nb.startsWith("nb_quality:") && nb.contains("=") =>
        val body = nb.stripPrefix("nb_quality:")
        val Array(k, v) = body.split("=", 2)
        new NbQuality(k, v)
      case other =>
        throw new IllegalArgumentException(
          s"unknown attached function '$other'")
    }
  }
}
