package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Thin HTTP face over [[Client]] — the reference fronts every
  * collection operation with axum routes
  * (`rust/frontend/src/server.rs:290-400`); this maps the same path
  * shapes and JSON bodies onto the in-process client, so a wire caller
  * can drive create → add → get/query/search/count without touching the
  * Scala API. Serving plumbing only: every route delegates to the
  * already-tested client methods (the query capabilities ARE the
  * library; this is the last surface delta). JDK `HttpServer` on an
  * ephemeral loopback port — the same in-process fixture pattern the
  * HTTP attached-function specs prove; a production deployment would
  * front the same `Client` calls with any JVM HTTP server.
  *
  * Routes (reference path shapes, `{c}` = collection name):
  * {{{
  *   POST /api/v2/tenants/{t}/databases/{d}/collections        create {name, get_or_create?}
  *   GET  /api/v2/tenants/{t}/databases/{d}/collections        list
  *   GET  /api/v2/tenants/{t}/databases/{d}/collections/{c}    descriptor
  *   GET  /api/v2/collections/{crn}                            by CRN
  *   POST .../collections/{c}/add | /upsert | /update          records payload
  *   POST .../collections/{c}/delete                           {ids}
  *   GET  .../collections/{c}/count                            {count}
  *   GET  .../collections/{c}/indexing_status                  progress
  *   POST .../collections/{c}/get                              GetRequest fields
  *   POST .../collections/{c}/query                            {query_embeddings, n_results, where?}
  *   POST .../collections/{c}/search                           Search WIRE payload (verbatim)
  * }}}
  *
  * Writes ack only after `commitLog` returns — the reference's frontend
  * acks after its log service accepts, never on buffer.
  */
final class HttpFace(spark: SparkSession, root: String) {
  private implicit val fmts: Formats = DefaultFormats
  private val server = HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  // one client per (tenant, database) — Client provisions both on open
  private val clients = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Client]()
  private def client(t: String, d: String): Client =
    clients.computeIfAbsent((t, d), _ => new Client(spark, root, t, d))

  def port: Int = server.getAddress.getPort

  def start(): Int = { server.start(); port }
  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  /** Heterogeneous metadata object → the write path's typed-map columns
    * (string/int/float/bool split like the reference's typed metadata).
    */
  private case class WireRecord(id: String, document: Option[String],
      ms: Map[String, String], mi: Map[String, Long],
      mf: Map[String, Double], mb: Map[String, Boolean],
      embedding: Option[Seq[Float]])

  private def parseRecords(j: JValue): Seq[WireRecord] = {
    val ids = (j \ "ids").extract[Seq[String]]
    def opt[T](k: String)(f: JValue => T): Seq[Option[T]] = (j \ k) match {
      case JArray(vs) => vs.map(v => if (v == JNull) None else Some(f(v)))
      case _ => Seq.fill(ids.size)(None)
    }
    val docs = opt("documents")(_.extract[String])
    val embs = opt("embeddings")(_.extract[Seq[Double]].map(_.toFloat))
    val metas = opt("metadatas")(identity)
    ids.zipWithIndex.map { case (id, i) =>
      var (ms, mi, mf, mb) = (Map.empty[String, String],
        Map.empty[String, Long], Map.empty[String, Double],
        Map.empty[String, Boolean])
      metas(i).foreach {
        case JObject(fields) => fields.foreach {
          case (k, JString(s)) => ms += k -> s
          case (k, JInt(n)) => mi += k -> n.toLong
          case (k, JLong(n)) => mi += k -> n
          case (k, JDouble(x)) => mf += k -> x
          case (k, JDecimal(x)) => mf += k -> x.toDouble
          case (k, JBool(b)) => mb += k -> b
          case (k, JNull) => ()
          case (k, other) => throw new IllegalArgumentException(
            s"metadata value for '$k' must be str/int/float/bool, got $other")
        }
        case other => throw new IllegalArgumentException(
          s"metadatas entries must be objects, got $other")
      }
      WireRecord(id, docs(i), ms, mi, mf, mb, embs(i))
    }
  }

  private def recordsDf(rs: Seq[WireRecord]): DataFrame = {
    import spark.implicits._
    rs.map(r => (r.id, r.document.orNull, r.ms, r.mi, r.mf, r.mb,
        r.embedding.orNull))
      .toDF("id", "document", "meta", "meta_int", "meta_float",
        "meta_bool", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private def jStr(s: String): JValue = JString(s)

  /** get/query responses are COLUMNAR like the reference's
    * (GetResponse/QueryResponse carry parallel arrays, not row objects).
    */
  private def columnar(rows: Seq[(String, Option[String])]): JValue =
    JObject("ids" -> JArray(rows.map(r => jStr(r._1)).toList),
      "documents" -> JArray(rows.map(r =>
        r._2.map(jStr).getOrElse(JNull)).toList))

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    try {
      val CrnR = "^/api/v2/collections/([^/]+)$".r
      val CollsR = "^/api/v2/tenants/([^/]+)/databases/([^/]+)/collections$".r
      val CollR = ("^/api/v2/tenants/([^/]+)/databases/([^/]+)/collections/" +
        "([^/]+)$").r
      val OpR = ("^/api/v2/tenants/([^/]+)/databases/([^/]+)/collections/" +
        "([^/]+)/([a-z_]+)$").r
      val FnAttachR = ("^/api/v2/tenants/([^/]+)/databases/([^/]+)/" +
        "collections/([^/]+)/functions/attach$").r
      val FnR = ("^/api/v2/tenants/([^/]+)/databases/([^/]+)/collections/" +
        "([^/]+)/functions/([^/]+)$").r
      val FnOpR = ("^/api/v2/tenants/([^/]+)/databases/([^/]+)/" +
        "collections/([^/]+)/attached_functions/([^/]+)/([a-z_]+)$").r
      (method, path) match {
        case ("GET", CrnR(crn)) =>
          val h = client("default_tenant", "default_database")
            .getCollectionByCrn(java.net.URLDecoder.decode(crn, "UTF-8"))
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
            "name" -> jStr(h.ref.name), "tenant" -> jStr(h.ref.tenant),
            "database" -> jStr(h.ref.database)))))
        case ("POST", CollsR(t, d)) =>
          val j = JsonMethods.parse(readBody(ex))
          val name = (j \ "name").extract[String]
          val goc = (j \ "get_or_create") match {
            case JBool(b) => b; case _ => false }
          val c = client(t, d)
          val existed = c.listCollections().contains(name)
          if (existed && !goc)
            respond(ex, 409, s"""{"error":"collection [$name] exists"}""")
          else {
            val h = if (existed) c.getCollection(name)
              else c.createCollection(name)
            respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
              "name" -> jStr(h.ref.name), "created" -> JBool(!existed)))))
          }
        case ("GET", CollsR(t, d)) =>
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(
            JArray(client(t, d).listCollections()
              .map(n => JObject("name" -> jStr(n))).toList))))
        case ("GET", CollR(t, d, c)) =>
          val h = client(t, d).getCollection(c)
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
            "name" -> jStr(h.ref.name), "tenant" -> jStr(t),
            "database" -> jStr(d)))))
        case ("DELETE", CollR(t, d, c)) =>
          client(t, d).deleteCollection(c)
          respond(ex, 200, "{}")
        case ("GET", OpR(t, d, c, "count")) =>
          respond(ex, 200,
            s"""{"count":${client(t, d).getCollection(c).count()}}""")
        case ("GET", OpR(t, d, c, "indexing_status")) =>
          val st = client(t, d).getCollection(c).indexingStatus()
          respond(ex, 200,
            s"""{"op_indexing_progress":${st.opIndexingProgress},""" +
            s""""num_unindexed_ops":${st.numUnindexedOps},""" +
            s""""num_indexed_ops":${st.numIndexedOps},""" +
            s""""total_ops":${st.totalOps}}""")
        case ("POST", OpR(t, d, c, op))
            if op == "add" || op == "upsert" || op == "update" =>
          val h = client(t, d).getCollection(c)
          val df = recordsDf(parseRecords(JsonMethods.parse(readBody(ex))))
          op match {
            case "add" => h.add(df)
            case "upsert" => h.upsert(df)
            case _ => h.update(df)
          }
          val pos = h.commitLog() // ack only after the log accepted
          respond(ex, 201, s"""{"log_position":$pos}""")
        case ("POST", OpR(t, d, c, "delete")) =>
          val j = JsonMethods.parse(readBody(ex))
          val h = client(t, d).getCollection(c)
          val n = h.delete(
            ids = (j \ "ids").toOption.map(_.extract[Seq[String]]),
            where = (j \ "where").toOption
              .map(w => graft.model.WhereParser.parse(
                JsonMethods.compact(JsonMethods.render(w)))),
            whereDocument = (j \ "where_document").toOption
              .map(w => graft.model.WhereParser.parse(
                JsonMethods.compact(JsonMethods.render(w)))))
          h.commitLog()
          respond(ex, 200, s"""{"deleted":$n}""")
        case ("POST", OpR(t, d, c, "get")) =>
          val j = JsonMethods.parse(readBody(ex))
          val h = client(t, d).getCollection(c)
          val rows = h.get(
            where = (j \ "where").toOption.map(w =>
              graft.model.WhereParser.parse(
                JsonMethods.compact(JsonMethods.render(w)))),
            limit = (j \ "limit").toOption.map(_.extract[Int]),
            offset = (j \ "offset").toOption.map(_.extract[Int]).getOrElse(0),
            ids = (j \ "ids").toOption.map(_.extract[Seq[String]]),
            whereDocument = (j \ "where_document").toOption.map(w =>
              graft.model.WhereParser.parse(
                JsonMethods.compact(JsonMethods.render(w)))))
            .select(col("id"), col("document"))
            .collect().toSeq
            .map(r => (r.getString(0), Option(r.getString(1))))
          respond(ex, 200, JsonMethods.compact(
            JsonMethods.render(columnar(rows))))
        case ("POST", OpR(t, d, c, "query")) =>
          val j = JsonMethods.parse(readBody(ex))
          val h = client(t, d).getCollection(c)
          import spark.implicits._
          val qs = (j \ "query_embeddings").extract[Seq[Seq[Double]]]
            .zipWithIndex
            .map { case (e, i) => (i.toLong, e.map(_.toFloat)) }
            .toDF("query_id", "q_embedding")
            .withColumn("q_embedding",
              col("q_embedding").cast("array<float>"))
          val k = (j \ "n_results").toOption.map(_.extract[Int]).getOrElse(10)
          val where = (j \ "where").toOption.map(w =>
            graft.model.WhereParser.parse(
              JsonMethods.compact(JsonMethods.render(w))))
          // the reference's collection_query serves from the vector
          // SEGMENT INDEX when the collection declares one (plus the WAL
          // tail leg) — exact scan only for index-less collections
          val out = (if (h.ref.schema.vectorIndex.isDefined)
              h.queryAnn(qs, k, where = where)
            else h.query(qs, k, where = where))
            .select(col("query_id"), col("rank"), col("id"), col("dist"))
            .collect().toSeq
            .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
          val ids = JArray(out.map { case (_, rs) =>
            JArray(rs.sortBy(_.getLong(1)).map(r => jStr(r.getString(2)))
              .toList) }.toList)
          val dists = JArray(out.map { case (_, rs) =>
            JArray(rs.sortBy(_.getLong(1)).map(r => JDouble(r.getDouble(3)))
              .toList) }.toList)
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
            "ids" -> ids, "distances" -> dists))))
        case ("POST", OpR(t, d, c, "fork")) =>
          val j = JsonMethods.parse(readBody(ex))
          val h = client(t, d).forkCollection(c,
            (j \ "new_name").extract[String])
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
            "name" -> jStr(h.ref.name),
            "forked_from" -> jStr(c)))))
        case ("PUT", CollR(t, d, c)) =>
          // update_collection: rename and/or replace metadata
          val j = JsonMethods.parse(readBody(ex))
          val r = client(t, d).modifyCollection(c,
            newName = (j \ "new_name").toOption.map(_.extract[String]),
            metadata = (j \ "new_metadata").toOption.collect {
              case JObject(fs) => fs.collect {
                case (k, JString(v)) => k -> v }.toMap })
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
            "name" -> jStr(r.ref.name)))))
        case ("POST", FnAttachR(t, d, c)) =>
          val j = JsonMethods.parse(readBody(ex))
          val r = client(t, d).attachFunction(c,
            (j \ "name").extract[String],
            (j \ "function_id").extract[String],
            (j \ "output_collection").extract[String],
            params = (j \ "params").toOption.collect {
              case JObject(fs) => fs.collect {
                case (k, JString(v)) => k -> v }.toMap }
              .getOrElse(Map.empty),
            minRecordsForInvocation = (j \ "min_records_for_invocation")
              .toOption.map(_.extract[Long]).getOrElse(0L))
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
            "name" -> jStr(r.function.name),
            "created" -> JBool(r.created)))))
        case ("GET", FnR(t, d, c, fn)) =>
          val i = client(t, d).getAttachedFunction(c, fn)
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
            "name" -> jStr(i.name), "function_id" -> jStr(i.functionId),
            "output_collection" -> jStr(i.outputCollection),
            "active" -> JBool(i.active)))))
        case ("POST", FnOpR(t, d, c, fn, "add_input")) =>
          val j = JsonMethods.parse(readBody(ex))
          val i = client(t, d).addAttachedFunctionInput(c, fn,
            (j \ "input").extract[String])
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(
            "inputs" -> JArray(i.inputCollections.map(jStr).toList)))))
        case ("POST", FnOpR(t, d, c, fn, "detach")) =>
          val j = scala.util.Try(JsonMethods.parse(readBody(ex)))
            .getOrElse(JNothing)
          val del = (j \ "delete_output") match {
            case JBool(b) => b; case _ => false }
          client(t, d).detachFunction(c, fn, deleteOutput = del)
          respond(ex, 200, "{}")
        case ("POST", OpR(t, d, c, "search")) =>
          // the Search WIRE payload parses server-side exactly as the
          // in-process surface does — body passes through verbatim
          val h = client(t, d).getCollection(c)
          val frames = h.searchAll(readBody(ex))
          val payloads = frames.map { df =>
            val rows = df.select(col("id")).collect()
            JObject("ids" -> JArray(rows.map(r => jStr(r.getString(0)))
              .toList))
          }
          respond(ex, 200, JsonMethods.compact(JsonMethods.render(
            JArray(payloads.toList))))
        case _ =>
          respond(ex, 404, s"""{"error":"no route: $method $path"}""")
      }
    } catch {
      case e: NoSuchElementException =>
        respond(ex, 404, JsonMethods.compact(JsonMethods.render(
          JObject("error" -> jStr(String.valueOf(e.getMessage))))))
      // the catalog rejects missing names via require — "no such" is the
      // reference's NotFoundError, every other rejection a bad request
      case e: IllegalArgumentException
          if String.valueOf(e.getMessage).contains("no such") =>
        respond(ex, 404, JsonMethods.compact(JsonMethods.render(
          JObject("error" -> jStr(String.valueOf(e.getMessage))))))
      case e: Throwable =>
        respond(ex, 400, JsonMethods.compact(JsonMethods.render(
          JObject("error" -> jStr(String.valueOf(e.getMessage))))))
    }
  }

  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(null) // single-threaded: requests serialize, no
                           // cross-request session races in the fixture
}
