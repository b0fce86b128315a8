package graft.model

import graft.operators.Rank
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Parser for the reference's Search API wire payload
  * (`rust/types/src/execution/plan.rs:235` `SearchPayload`, serde shapes
  * in `rust/types/src/execution/operator.rs`):
  *
  * {{{
  *   {
  *     "filter": { <where JSON — query_ids fold into "#id" $in> },
  *     "rank": {"$sum": [{"$mul": [{"$val": 0.6}, {"$knn":
  *       {"query": [0.1, 0.2], "limit": 50, "default": 2.0,
  *        "return_rank": false}}]}, ...]},
  *     "group_by": {"keys": ["label"],
  *       "aggregate": {"$min_k": {"keys": ["#score"], "k": 1}}},
  *     "limit": {"offset": 0, "limit": 10},
  *     "select": {"keys": ["#score", "label"]}
  *   }
  * }}}
  *
  * `$knn` leaves (`operator.rs:1163-1174`) carry the dense query vector
  * inline; they are hoisted into [[Request.leaves]] in traversal order and
  * replaced by [[Rank.Leaf]] references, exactly how the reference's
  * `Rank::knn_queries` lifts them for the Knn orchestrators. A leaf with
  * no `default` uses f32::MAX (records the leaf missed rank last, matching
  * "absent = unranked" without dropping rows the other leaves retrieved).
  */
object SearchParser {

  /** One hoisted `$knn` leaf — the payload's `QueryVector` is untagged
    * (`operator.rs:861-866`): a JSON array is a dense query, an object
    * with `indices`/`values` is a sparse one against a per-key sparse
    * index (`Key::field`, `operator.rs:855`).
    */
  sealed trait KnnLeaf { def limit: Int }
  final case class KnnLeafDense(query: Seq[Float], limit: Int) extends KnnLeaf
  final case class KnnLeafSparse(key: String, indices: Seq[Long],
      values: Seq[Float], limit: Int) extends KnnLeaf
  /** A raw-text query leaf — the reference's `Knn(query="hello world")`
    * (`chromadb/execution/expression/operator.py:1043-1110`): the server
    * embeds it with the collection's declared embedding function, on the
    * QUERY side of the protocol (`embedQuery`). With a `key` other than
    * `#embedding` (`Knn(query="...", key="custom_embedding")`,
    * operator.py:1068) the text embeds with the SCHEMA's sparse function
    * for that key and searches its sparse index.
    */
  final case class KnnLeafText(text: String, limit: Int,
      key: Option[String] = None) extends KnnLeaf

  /** Grouped top-k: group keys (metadata field names), the aggregate's
    * multi-key ordering (`$min_k`/`$max_k` over `sortKeys` — `#score`
    * and/or metadata fields, `operator.rs:2306-2323` `Aggregate::MinK
    * {keys: Vec<Key>}`), and per-group k. MinK keeps the k smallest by
    * the key tuple ascending, MaxK the k largest (all keys descending).
    */
  final case class Group(keys: Seq[String], k: Int, descending: Boolean,
      sortKeys: Seq[String] = Seq("#score"))

  final case class Request(
      filter: Option[Where.Expr],
      rank: Rank.Expr,
      leaves: Seq[KnnLeaf],
      groupBy: Option[Group],
      limit: Option[Int],
      offset: Int,
      select: Seq[String])

  private val NoDefault: Double = Float.MaxValue.toDouble

  /** Parse a request that may carry SEVERAL payloads
    * (`Search{payloads: Vec<SearchPayload>}`, `plan.rs:588-592`):
    * `{"payloads": [p1, p2, …]}` → one [[Request]] per payload in order;
    * the HTTP wire envelope spells the same field `searches`
    * (`SearchRequestPayload`, `rust/types/src/api_types.rs:2444-2450`) —
    * both keys accept; anything else parses as a single payload.
    */
  def parseMany(json: String): Seq[Request] = {
    val j = JsonMethods.parse(json)
    (j \ "payloads", j \ "searches") match {
      case (JArray(_), JArray(_)) => throw new IllegalArgumentException(
        "pass either payloads or searches, not both")
      case (JArray(ps), _) =>
        if (ps.isEmpty)
          throw new IllegalArgumentException("payloads must be non-empty")
        ps.map(p => parse(JsonMethods.compact(JsonMethods.render(p))))
      case (_, JArray(ps)) =>
        if (ps.isEmpty)
          throw new IllegalArgumentException("searches must be non-empty")
        ps.map(p => parse(JsonMethods.compact(JsonMethods.render(p))))
      case _ => Seq(parse(json))
    }
  }

  def parse(json: String): Request = {
    val j = JsonMethods.parse(json)
    val leaves = scala.collection.mutable.ArrayBuffer[KnnLeaf]()

    def num(v: JValue, what: String): Double = v match {
      case JInt(i) => i.toDouble
      case JLong(i) => i.toDouble
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case o => throw new IllegalArgumentException(s"bad $what: $o")
    }

    def rankExpr(v: JValue): Rank.Expr = v match {
      case JObject(List((op, body))) => (op, body) match {
        case ("$val", n) => Rank.Val(num(n, "$val"))
        case ("$knn", JObject(fields)) =>
          val m = fields.toMap
          val lim = m.get("limit").map(num(_, "limit").toInt).getOrElse(16)
          val leaf = m.getOrElse("query",
            throw new IllegalArgumentException("$knn needs query")) match {
            case JArray(vs) =>
              KnnLeafDense(vs.map(x => num(x, "query element").toFloat), lim)
            case JObject(qf) =>
              val qm = qf.toMap
              // indices are exact 64-bit ids (hashed terms) — never route
              // them through Double, its 53-bit mantissa corrupts them
              val idx = qm.get("indices") match {
                case Some(JArray(is)) => is.map {
                  case JInt(i) => i.toLong
                  case JLong(l) => l
                  case o => throw new IllegalArgumentException(s"bad index $o")
                }
                case o => throw new IllegalArgumentException(s"bad sparse indices $o")
              }
              val vals = qm.get("values") match {
                case Some(JArray(vs)) => vs.map(x => num(x, "value").toFloat)
                case o => throw new IllegalArgumentException(s"bad sparse values $o")
              }
              if (idx.size != vals.size) throw new IllegalArgumentException(
                "sparse vector length mismatch")
              val key = m.get("key") match {
                case Some(JString(s)) => s
                case _ => throw new IllegalArgumentException(
                  "sparse $knn needs a key (the per-key sparse index)")
              }
              KnnLeafSparse(key, idx, vals, lim)
            case JString(t) =>
              val key = m.get("key") match {
                case Some(JString(s)) if s != "#embedding" &&
                  s != "EMBEDDING" => Some(s)
                case _ => None
              }
              KnnLeafText(t, lim, key)
            case o => throw new IllegalArgumentException(s"bad $$knn query $o")
          }
          val default = m.get("default") match {
            case Some(JNull) | None => NoDefault
            case Some(d) => num(d, "default")
          }
          val rr = m.get("return_rank") match {
            case Some(JBool(b)) => b
            case _ => false
          }
          leaves += leaf
          Rank.Leaf(leaves.size - 1, default, rr)
        case ("$sum", JArray(cs)) => Rank.Sum(cs.map(rankExpr))
        case ("$mul", JArray(cs)) => Rank.Mul(cs.map(rankExpr))
        case ("$min", JArray(cs)) => Rank.Min(cs.map(rankExpr))
        case ("$max", JArray(cs)) => Rank.Max(cs.map(rankExpr))
        case ("$sub", JObject(fields)) =>
          val m = fields.toMap
          Rank.Sub(rankExpr(m("left")), rankExpr(m("right")))
        case ("$div", JObject(fields)) =>
          val m = fields.toMap
          Rank.Div(rankExpr(m("left")), rankExpr(m("right")))
        case ("$abs", e) => Rank.Abs(rankExpr(e))
        case ("$exp", e) => Rank.Exp(rankExpr(e))
        case ("$log", e) => Rank.Log(rankExpr(e))
        case other => throw new IllegalArgumentException(s"bad rank op $other")
      }
      case other => throw new IllegalArgumentException(s"bad rank expr $other")
    }

    val filter = (j \ "filter") match {
      case JNothing | JNull | JObject(Nil) => None
      case w => Some(WhereParser.parse(JsonMethods.compact(JsonMethods.render(w))))
    }
    val rank = (j \ "rank") match {
      case JNothing | JNull =>
        throw new IllegalArgumentException("search payload needs rank")
      case r => rankExpr(r)
    }
    val groupBy = (j \ "group_by") match {
      case JNothing | JNull | JObject(Nil) => None
      case g =>
        val keys = (g \ "keys") match {
          case JArray(ks) => ks.collect { case JString(s) => s }
          case _ => Nil
        }
        (g \ "aggregate") match {
          // GroupBy is active only with keys AND an aggregate
          // (operator.rs:2376-2381 is_active)
          case JObject(List((aggOp, body))) if keys.nonEmpty =>
            val k = (body \ "k") match {
              case v => num(v, "aggregate k").toInt
            }
            val desc = aggOp match {
              case "$min_k" => false
              case "$max_k" => true
              case o => throw new IllegalArgumentException(s"bad aggregate $o")
            }
            val sortKeys = (body \ "keys") match {
              case JArray(ks) if ks.nonEmpty =>
                ks.collect { case JString(s) => s }
              case _ => Seq("#score")
            }
            Some(Group(keys, k, desc, sortKeys))
          case _ => None
        }
    }
    val limit = (j \ "limit" \ "limit") match {
      case JNothing | JNull => None
      case v => Some(num(v, "limit").toInt)
    }
    val offset = (j \ "limit" \ "offset") match {
      case JNothing | JNull => 0
      case v => num(v, "offset").toInt
    }
    val select = (j \ "select" \ "keys") match {
      case JArray(ks) => ks.collect { case JString(s) => s }
      case _ => Nil
    }
    Request(filter, rank, leaves.toSeq, groupBy, limit, offset, select)
  }
}
