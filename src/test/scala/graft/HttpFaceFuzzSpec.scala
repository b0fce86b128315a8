package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Wire-edge fuzz: the JSON → typed-maps → read-back corners where wire
  * surfaces rot. ≥100 random records — unicode/quote/newline documents,
  * sparse null columns, heterogeneous metadata (str/int/float/bool +
  * all four typed arrays, null entries), optional uris/embeddings —
  * round-trip add→get over REAL HTTP and must read back exactly what an
  * IN-PROCESS writer produces from the same data on a sibling root.
  * Plus error-shape assertions: malformed bodies and ill-typed payloads
  * answer 400 with a JSON error, never a hang or a 500.
  */
class HttpFaceFuzzSpec extends AnyFunSuite {
  import SparkTestSession.spark
  private implicit val fmts: Formats = DefaultFormats

  private val http = java.net.http.HttpClient.newHttpClient()

  private def post(url: String, body: String): (Int, String) = {
    val r = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .method("POST", java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = http.send(r, java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private case class Rec(id: String, doc: Option[String], uri: Option[String],
      emb: Option[Seq[Float]],
      ms: Map[String, String], mi: Map[String, Long],
      mf: Map[String, Double], mb: Map[String, Boolean],
      msa: Map[String, Seq[String]], mia: Map[String, Seq[Long]],
      mfa: Map[String, Seq[Double]], mba: Map[String, Seq[Boolean]]) {
    def hasMeta: Boolean = ms.nonEmpty || mi.nonEmpty || mf.nonEmpty ||
      mb.nonEmpty || msa.nonEmpty || mia.nonEmpty || mfa.nonEmpty ||
      mba.nonEmpty
  }

  private def gen(rnd: scala.util.Random, n: Int): Seq[Rec] = {
    val weird = Seq("plain", "with \"quotes\"", "new\nline", "tab\there",
      "ünïcødé ẞ 中文 🚀", "back\\slash", "{not json}", "  spaced  ", "")
    def str() = weird(rnd.nextInt(weird.length)) + rnd.nextInt(1000)
    (0 until n).map { i =>
      var (ms, mi, mf, mb) = (Map.empty[String, String],
        Map.empty[String, Long], Map.empty[String, Double],
        Map.empty[String, Boolean])
      var (msa, mia, mfa, mba) = (Map.empty[String, Seq[String]],
        Map.empty[String, Seq[Long]], Map.empty[String, Seq[Double]],
        Map.empty[String, Seq[Boolean]])
      (0 until rnd.nextInt(5)).foreach { j =>
        val k = s"k${rnd.nextInt(8)}_$j"
        rnd.nextInt(8) match {
          case 0 => ms += k -> str()
          case 1 => mi += k -> (rnd.nextLong() % 100000)
          case 2 => mf += k -> (math.round(rnd.nextDouble() * 1e6) / 1e3)
          case 3 => mb += k -> rnd.nextBoolean()
          case 4 => msa += k -> Seq.fill(rnd.nextInt(3) + 1)(str())
          case 5 => mia += k -> Seq.fill(rnd.nextInt(3) + 1)(rnd.nextInt(999).toLong)
          case 6 => mfa += k -> Seq.fill(rnd.nextInt(3) + 1)(
            math.round(rnd.nextDouble() * 1e6) / 1e3)
          case 7 => mba += k -> Seq.fill(rnd.nextInt(3) + 1)(rnd.nextBoolean())
        }
      }
      Rec(f"id_$i%03d_${rnd.nextInt(999)}",
        if (rnd.nextInt(4) == 0) None else Some(str()),
        if (rnd.nextInt(3) == 0) None else Some(s"s3://b/${rnd.nextInt(999)}"),
        if (rnd.nextInt(4) == 0) None
        else Some(Seq.fill(4)(math.round(rnd.nextFloat() * 1000) / 64f)),
        ms, mi, mf, mb, msa, mia, mfa, mba)
    }
  }

  /** Render the wire add payload through the json4s AST (proper escaping
    * of the adversarial strings — hand-built JSON would be testing the
    * test).
    */
  private def payload(rs: Seq[Rec]): String = {
    def metaJ(r: Rec): JValue =
      if (!r.hasMeta) JNull
      else JObject(
        r.ms.map { case (k, v) => k -> (JString(v): JValue) }.toList ++
        r.mi.map { case (k, v) => k -> (JLong(v): JValue) } ++
        r.mf.map { case (k, v) => k -> (JDouble(v): JValue) } ++
        r.mb.map { case (k, v) => k -> (JBool(v): JValue) } ++
        r.msa.map { case (k, v) => k -> (JArray(v.map(JString(_)).toList): JValue) } ++
        r.mia.map { case (k, v) => k -> (JArray(v.map(JLong(_)).toList): JValue) } ++
        r.mfa.map { case (k, v) => k -> (JArray(v.map(JDouble(_)).toList): JValue) } ++
        r.mba.map { case (k, v) => k -> (JArray(v.map(JBool(_)).toList): JValue) })
    JsonMethods.compact(JsonMethods.render(JObject(
      "ids" -> JArray(rs.map(r => JString(r.id): JValue).toList),
      "documents" -> JArray(rs.map(r =>
        r.doc.map(JString(_): JValue).getOrElse(JNull)).toList),
      "uris" -> JArray(rs.map(r =>
        r.uri.map(JString(_): JValue).getOrElse(JNull)).toList),
      "embeddings" -> JArray(rs.map(r =>
        r.emb.map(e => JArray(e.map(f => JDouble(f.toDouble): JValue).toList)
          : JValue).getOrElse(JNull)).toList),
      "metadatas" -> JArray(rs.map(metaJ).toList))))
  }

  /** The same records as the in-process writer's input frame. */
  private def frame(rs: Seq[Rec]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rs.map(r => (r.id, r.doc.orNull, r.uri.orNull, r.ms, r.mi, r.mf, r.mb,
        (r.msa, r.mia, r.mfa, r.mba), r.emb.orNull))
      .toDF("id", "document", "uri", "meta", "meta_int", "meta_float",
        "meta_bool", "arrs", "embedding")
      .withColumn("meta_str_arr", col("arrs._1"))
      .withColumn("meta_int_arr", col("arrs._2"))
      .withColumn("meta_float_arr", col("arrs._3"))
      .withColumn("meta_bool_arr", col("arrs._4"))
      .drop("arrs")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  /** Normal form of one record as read back, keyed by id. */
  private type Norm = (Option[String], Option[String], Option[Seq[Float]],
    Map[String, Any])

  private def normWire(j: JValue): Map[String, Norm] = {
    val ids = (j \ "ids").extract[Seq[String]]
    def arr(k: String): Seq[JValue] = (j \ k) match {
      case JArray(vs) => vs; case _ => Seq.fill(ids.size)(JNull) }
    val (docs, uris, embs, metas) =
      (arr("documents"), arr("uris"), arr("embeddings"), arr("metadatas"))
    ids.indices.map { i =>
      val meta: Map[String, Any] = metas(i) match {
        case JObject(fs) => fs.map {
          case (k, JString(s)) => k -> s
          case (k, JLong(n)) => k -> n
          case (k, JInt(n)) => k -> n.toLong
          case (k, JDouble(x)) => k -> x
          case (k, JBool(b)) => k -> b
          case (k, JArray(vs)) => k -> vs.map {
            case JString(s) => s
            case JLong(n) => n
            case JInt(n) => n.toLong
            case JDouble(x) => x
            case JBool(b) => b
            case other => other
          }
          case (k, v) => k -> v
        }.toMap
        case _ => Map.empty
      }
      ids(i) -> ((docs(i).toOption.map(_.extract[String]),
        uris(i).toOption.map(_.extract[String]),
        embs(i) match {
          case JArray(vs) => Some(vs.map(_.extract[Double].toFloat))
          case _ => None
        }, meta))
    }.toMap
  }

  private def normRows(rows: Seq[org.apache.spark.sql.Row]): Map[String, Norm] =
    rows.map { r =>
      def idx(c: String) = r.fieldIndex(c)
      def mm[T](c: String): Map[String, T] =
        if (r.isNullAt(idx(c))) Map.empty
        else r.getMap[String, T](idx(c)).toMap
      val meta: Map[String, Any] =
        mm[String]("meta_str") ++ mm[Long]("meta_int") ++
        mm[Double]("meta_float") ++ mm[Boolean]("meta_bool") ++
        mm[scala.collection.Seq[String]]("meta_str_arr").view
          .mapValues(_.toSeq).toMap ++
        mm[scala.collection.Seq[Long]]("meta_int_arr").view
          .mapValues(_.toSeq).toMap ++
        mm[scala.collection.Seq[Double]]("meta_float_arr").view
          .mapValues(_.toSeq).toMap ++
        mm[scala.collection.Seq[Boolean]]("meta_bool_arr").view
          .mapValues(_.toSeq).toMap
      r.getString(idx("id")) -> ((
        Option(r.getString(idx("document"))),
        Option(r.getString(idx("uri"))),
        if (r.isNullAt(idx("embedding"))) None
        else Some(r.getSeq[Float](idx("embedding")).toSeq),
        meta))
    }.toMap

  test("120 random wire records round-trip add→get over HTTP identical " +
      "to the in-process writer; duplicate ids resolve LWW both ways") {
    val rnd = new scala.util.Random(20260816L)
    val rootW = java.nio.file.Files.createTempDirectory("graft_fz_wire").toString
    val rootP = java.nio.file.Files.createTempDirectory("graft_fz_proc").toString
    val face = new graft.api.HttpFace(spark, rootW)
    val port = face.start()
    try {
      val base = s"http://127.0.0.1:$port/api/v2/tenants/t1/databases/db1"
      assert(post(s"$base/collections", """{"name":"fuzz"}""")._1 == 200)
      val twin = new graft.api.Client(spark, rootP, "t1", "db1")
        .createCollection("fuzz")

      val recs = gen(rnd, 120)
      // batches of 40 (< the 300 write quota), same order both ways;
      // the LAST batch re-adds 10 earlier ids with new content — the
      // wire face and the in-process writer must resolve them the same
      val dups = recs.take(10).map(r => r.copy(
        doc = Some("rewritten " + r.id), mi = Map("v" -> 2L)))
      recs.grouped(40).foreach { b =>
        val (c, body) = post(s"$base/collections/fuzz/add", payload(b))
        assert(c == 201, s"wire add failed: $body")
        twin.add(frame(b))
      }
      // re-add of existing ids goes through UPSERT (add keeps the
      // original — the reference rejects duplicate inserts; upsert is
      // the overwrite op) — both surfaces must resolve identically
      val (cDup, bDup) = post(s"$base/collections/fuzz/upsert", payload(dups))
      assert(cDup == 201, s"wire upsert failed: $bDup")
      twin.upsert(frame(dups))

      val include = Seq("documents", "metadatas", "embeddings", "uris")
      val (cg, body) = post(s"$base/collections/fuzz/get",
        s"""{"limit":300,"include":[${include.map("\"" + _ + "\"").mkString(",")}]}""")
      assert(cg == 200, s"wire get failed: $body")
      val wire = normWire(JsonMethods.parse(body))
      val proc = normRows(twin.get(limit = Some(300),
        include = Seq("document", "uri", "embedding", "meta_str", "meta_int",
          "meta_float", "meta_bool", "meta_str_arr", "meta_int_arr",
          "meta_float_arr", "meta_bool_arr")).collect().toSeq)

      assert(wire.keySet == proc.keySet,
        s"id sets differ: wire-only=${wire.keySet -- proc.keySet} " +
          s"proc-only=${proc.keySet -- wire.keySet}")
      wire.keySet.toSeq.sorted.foreach { id =>
        assert(wire(id) == proc(id),
          s"record '$id' differs:\n wire=${wire(id)}\n proc=${proc(id)}")
      }
      // the duplicate upserts won (last write wins, both surfaces; the
      // strict wire==proc loop above already pins merge-vs-replace)
      dups.foreach { d =>
        assert(wire(d.id)._1.contains("rewritten " + d.id))
        assert(wire(d.id)._4.get("v").contains(2L))
      }
    } finally face.stop()
  }

  test("random filtered gets and knn queries answer identically over " +
      "the wire and in-process") {
    val rnd = new scala.util.Random(13L)
    val root = java.nio.file.Files.createTempDirectory("graft_fz_qry").toString
    val face = new graft.api.HttpFace(spark, root)
    val port = face.start()
    try {
      val base = s"http://127.0.0.1:$port/api/v2/tenants/t1/databases/db1"
      assert(post(s"$base/collections", """{"name":"fqz"}""")._1 == 200)
      // the same records through BOTH surfaces' write paths would test
      // the writer twice — here one write, two READ paths over it
      val recs = gen(rnd, 90).map(r => r.copy(
        emb = Some(r.emb.getOrElse(Seq.fill(4)(0f))),
        mi = r.mi + ("bucket" -> rnd.nextInt(5).toLong),
        ms = r.ms + ("tier" -> s"t${rnd.nextInt(3)}")))
      recs.grouped(45).foreach { b =>
        assert(post(s"$base/collections/fqz/add", payload(b))._1 == 201)
      }
      val inproc = new graft.api.Client(spark, root, "t1", "db1")
        .getCollection("fqz")

      // 25 random where trees over the planted keys: wire get and
      // in-process get must agree on the matching id set
      def leaf(): String = rnd.nextInt(4) match {
        case 0 => s"""{"bucket":{"$$eq":${rnd.nextInt(5)}}}"""
        case 1 => s"""{"tier":{"$$eq":"t${rnd.nextInt(3)}"}}"""
        case 2 => s"""{"bucket":{"$$gte":${rnd.nextInt(5)}}}"""
        case _ => s"""{"bucket":{"$$in":[${rnd.nextInt(5)},${rnd.nextInt(5)}]}}"""
      }
      def tree(depth: Int): String =
        if (depth == 0 || rnd.nextInt(3) == 0) leaf()
        else {
          val op = if (rnd.nextBoolean()) "$and" else "$or"
          s"""{"$op":[${tree(depth - 1)},${tree(depth - 1)}]}"""
        }
      (1 to 25).foreach { _ =>
        val w = tree(2)
        val (c, body) = post(s"$base/collections/fqz/get",
          s"""{"where":$w,"limit":300,"include":[]}""")
        assert(c == 200, s"wire get where=$w failed: $body")
        val wireIds = (JsonMethods.parse(body) \ "ids")
          .extract[Seq[String]].toSet
        val procIds = inproc.get(
          where = Some(graft.model.WhereParser.parse(w)),
          limit = Some(300), include = Seq())
          .collect().map(_.getString(0)).toSet
        assert(wireIds == procIds,
          s"where=$w: wire=${wireIds.size} ids, proc=${procIds.size}; " +
            s"wire-only=${wireIds -- procIds} proc-only=${procIds -- wireIds}")
      }

      // 15 random knn queries: distances must match to float tolerance,
      // ids must match wherever the distance uniquely ranks them
      (1 to 15).foreach { _ =>
        val q = Seq.fill(4)(math.round(rnd.nextFloat() * 1000) / 64f)
        val (c, body) = post(s"$base/collections/fqz/query",
          s"""{"query_embeddings":[[${q.mkString(",")}]],"n_results":7,
             |"include":["distances"]}""".stripMargin)
        assert(c == 200, s"wire query failed: $body")
        val j = JsonMethods.parse(body)
        val wireIds = (j \ "ids")(0).extract[Seq[String]]
        val wireDs = (j \ "distances")(0).extract[Seq[Double]]
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val qdf = Seq((0L, q)).toDF("query_id", "q_embedding")
          .withColumn("q_embedding", col("q_embedding").cast("array<float>"))
        val proc = inproc.query(qdf, 7).orderBy(col("rank"))
          .select("id", "dist").collect()
          .map(r => (r.getString(0), r.getDouble(r.fieldIndex("dist"))))
        assert(wireDs.size == proc.length)
        wireDs.zip(proc.map(_._2)).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-5, s"distance drift: $a vs $b")
        }
        wireIds.zip(proc.map(_._1)).zipWithIndex.foreach {
          case ((wi, pi), r) =>
            val tied = proc.map(_._2).count(d =>
              math.abs(d - proc(r)._2) < 1e-9) > 1
            assert(tied || wi == pi,
              s"rank $r: wire=$wi proc=$pi (untied distance)")
        }
      }
    } finally face.stop()
  }

  test("malformed and ill-typed wire bodies answer 400 with a JSON error") {
    val root = java.nio.file.Files.createTempDirectory("graft_fz_err").toString
    val face = new graft.api.HttpFace(spark, root)
    val port = face.start()
    try {
      val base = s"http://127.0.0.1:$port/api/v2/tenants/t1/databases/db1"
      assert(post(s"$base/collections", """{"name":"err"}""")._1 == 200)
      val cases = Seq(
        "not json at all",
        """{"ids":"scalar-not-array"}""",
        """{"ids":["a"],"documents":"scalar"}""",
        """{"ids":["a","b"],"documents":["only one"]}""",
        """{"ids":["a"],"metadatas":[["array","not","object"]]}""",
        """{"ids":["a"],"metadatas":[{"k":{"nested":"object"}}]}""",
        """{"ids":["a"],"embeddings":[["strings","not","floats"]]}""")
      cases.foreach { body =>
        val (c, resp) = post(s"$base/collections/err/add", body)
        assert(c == 400, s"body `$body` answered $c: $resp")
        assert((JsonMethods.parse(resp) \ "error") != JNothing,
          s"error shape must be {{\"error\":…}}, got $resp")
      }
      // query with a non-array embeddings field rejects, not 500s
      assert(post(s"$base/collections/err/query",
        """{"query_embeddings":"nope"}""")._1 == 400)
      // search with an unparseable rank tree rejects
      assert(post(s"$base/collections/err/search",
        """{"rank":{"$bogus":1}}""")._1 == 400)
    } finally face.stop()
  }
}
