package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap

/** In-process HTTP object-store fake with S3 semantics — the test double
  * [[graft.sources.HttpConditionalStore]] runs against:
  *
  *   - `PUT` with `If-None-Match: *` is ATOMIC create-once (backed by a
  *     ConcurrentHashMap putIfAbsent — the per-key atomicity a real
  *     object store provides); a loser gets `412 Precondition Failed`.
  *   - `HEAD`/`GET` 404 absent keys; `HEAD` carries RFC-1123
  *     `Last-Modified`.
  *   - `DELETE` is idempotent (`204` either way).
  *   - `GET /?list-type=2&prefix=&delimiter=/` answers ListObjectsV2
  *     XML: immediate keys as `<Contents><Key>`, deeper keys grouped
  *     into `<CommonPrefixes><Prefix>`.
  *   - Listing is READ-AFTER-WRITE consistent (S3 guarantees this since
  *     Dec 2020): a key acknowledged by PUT appears in the next LIST.
  *
  * `failEveryN > 0` injects a `503 Slow Down` on every Nth request
  * BEFORE applying it (the S3 throttling shape) — the client's retry
  * loop must make every operation succeed anyway. Each (method, path)
  * pair is throttled at most twice, keeping the injection well inside
  * the client's bounded retries: the test stays deterministic-green
  * while every operation still exercises the retry path under the
  * 16-thread race (unbounded injection could, with small probability,
  * throttle all of one thread's attempts and flake the suite).
  */
final class ObjectStoreHttpFake(pageSize: Int = 1000, failEveryN: Int = 0) {
  private val objects = new ConcurrentHashMap[String, (Array[Byte], Long)]()
  private val reqCount = new java.util.concurrent.atomic.AtomicLong(0)
  private val failed = new ConcurrentHashMap[String, Integer]()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** Test hook mirroring InMemoryConditionalStore: age a key backwards
    * so stale-claim guards can fire without waiting.
    */
  def backdate(key: String, ms: Long): Unit =
    Option(objects.get(key.stripPrefix("/"))).foreach { case (b, t) =>
      objects.put(key.stripPrefix("/"), (b, t - ms))
    }

  private def httpDate(ms: Long): String =
    java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneId.of("GMT")))

  private def respond(ex: HttpExchange, code: Int,
      body: Array[Byte] = Array.emptyByteArray): Unit = {
    if (ex.getRequestMethod == "HEAD" || body.isEmpty)
      ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, body.length.toLong)
      ex.getResponseBody.write(body)
    }
    ex.close()
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  /** ListObjectsV2 with PAGINATION like S3's (max-keys, here the fake's
    * `pageSize`): entries sort lexicographically, a page past the limit
    * sets IsTruncated + NextContinuationToken (the last emitted entry;
    * the next request resumes strictly after it).
    */
  private def listXml(prefix: String, token: Option[String]): String = {
    import scala.jdk.CollectionConverters._
    val keys = objects.keySet().asScala.toSeq.sorted
      .filter(_.startsWith(prefix))
    val (files, dirs) = keys.partition(k =>
      !k.stripPrefix(prefix).contains("/"))
    val common = dirs.map(k =>
      prefix + k.stripPrefix(prefix).takeWhile(_ != '/') + "/").distinct
    val entries = (files.map(_ -> true) ++ common.map(_ -> false))
      .sortBy(_._1)
      .dropWhile { case (e, _) => token.exists(e <= _) }
    val page = entries.take(pageSize)
    val truncated = entries.length > pageSize
    "<?xml version=\"1.0\"?><ListBucketResult>" +
      s"<Prefix>$prefix</Prefix>" +
      page.map {
        case (k, true) => s"<Contents><Key>$k</Key></Contents>"
        case (p, false) => s"<CommonPrefixes><Prefix>$p</Prefix></CommonPrefixes>"
      }.mkString +
      (if (truncated)
        "<IsTruncated>true</IsTruncated>" +
          s"<NextContinuationToken>${page.last._1}</NextContinuationToken>"
      else "<IsTruncated>false</IsTruncated>") +
      "</ListBucketResult>"
  }

  server.createContext("/", (ex: HttpExchange) => {
    try {
      val throttleKey = ex.getRequestMethod + " " + ex.getRequestURI.getPath
      if (failEveryN > 0 && reqCount.incrementAndGet() % failEveryN == 0 &&
          failed.merge(throttleKey, 1, (a, b) => a + b) <= 2)
        respond(ex, 503) // throttled BEFORE applying — client must retry
      else handle(ex)
    } catch {
      case t: Throwable =>
        try respond(ex, 500) catch { case _: Throwable => () }
        throw t
    }
  })

  private def handle(ex: HttpExchange): Unit = {
    {
      val key = java.net.URLDecoder.decode(
        ex.getRequestURI.getPath.stripPrefix("/"), "UTF-8")
      ex.getRequestMethod match {
        case "PUT" =>
          val bytes = ex.getRequestBody.readAllBytes()
          val conditional = Option(
            ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
          if (conditional) {
            // the linearization point: per-key atomic create-once
            val won = objects.putIfAbsent(key,
              (bytes, System.currentTimeMillis())) == null
            respond(ex, if (won) 200 else 412)
          } else {
            objects.put(key, (bytes, System.currentTimeMillis()))
            respond(ex, 200)
          }
        case "HEAD" =>
          Option(objects.get(key)) match {
            case Some((_, t)) =>
              ex.getResponseHeaders.set("Last-Modified", httpDate(t))
              respond(ex, 200)
            case None => respond(ex, 404)
          }
        case "GET" if key.isEmpty && query(ex).contains("prefix") =>
          val q = query(ex)
          val xml = listXml(q("prefix"), q.get("continuation-token"))
            .getBytes("UTF-8")
          respond(ex, 200, xml)
        case "GET" =>
          Option(objects.get(key)) match {
            case Some((b, t)) =>
              ex.getResponseHeaders.set("Last-Modified", httpDate(t))
              respond(ex, 200, b)
            case None => respond(ex, 404)
          }
        case "DELETE" =>
          objects.remove(key)
          respond(ex, 204)
        case _ => respond(ex, 405)
      }
    }
  }
  server.start()

  def stop(): Unit = server.stop(0)
}
