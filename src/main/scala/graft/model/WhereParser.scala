package graft.model

import graft.model.Where._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Parser for the reference's JSON `where` DSL
  * (`rust/frontend/src/types/where_parsing.rs`; Python dict form in
  * `chromadb/test/property/test_filtering.py`):
  *
  * {{{
  *   {"$and": [{"k": {"$gt": 5}}, {"$document": {"$contains": "x"}}]}
  *   {"k": "v"}                        — implicit $eq
  *   {"k": {"$in": [1, 2, 3]}}
  *   {"$document": {"$regex": "a.*b"}}
  *   {"#id": {"$in": ["id1", "id2"]}}
  * }}}
  */
object WhereParser {

  def parse(json: String): Expr = fromJValue(JsonMethods.parse(json))

  private def value(v: JValue): Value = v match {
    case JString(s) => VStr(s)
    case JInt(i)    => VInt(i.toLong)
    case JLong(i)   => VInt(i)
    case JDouble(d) => VFloat(d)
    case JDecimal(d) => VFloat(d.toDouble)
    case JBool(b)   => VBool(b)
    case other => throw new IllegalArgumentException(s"bad literal $other")
  }

  private def fromJValue(j: JValue): Expr = j match {
    case JObject(List((key, body))) => (key, body) match {
      case ("$and", JArray(cs)) => And(cs.map(fromJValue))
      case ("$or", JArray(cs))  => Or(cs.map(fromJValue))
      case ("$document", JObject(List((op, v)))) => (op, v) match {
        case ("$contains", JString(s))     => DocContains(s, negated = false)
        case ("$not_contains", JString(s)) => DocContains(s, negated = true)
        case ("$regex", JString(s))        =>
          Where.validateRegexSubset(s); DocRegex(s, negated = false)
        case ("$not_regex", JString(s))    =>
          Where.validateRegexSubset(s); DocRegex(s, negated = true)
        case other => throw new IllegalArgumentException(s"bad doc op $other")
      }
      case ("#id", JObject(List(("$in", JArray(ids))))) =>
        IdIn(ids.map { case JString(s) => s
          case o => throw new IllegalArgumentException(s"bad id $o") })
      case (k, JObject(List((op, v)))) => op match {
        case "$eq" | "$ne" | "$gt" | "$gte" | "$lt" | "$lte" =>
          Cmp(k, op, value(v))
        case "$in" => v match {
          case JArray(vs) => SetIn(k, vs.map(value), negated = false)
          case o => throw new IllegalArgumentException(s"$$in wants array, got $o")
        }
        case "$nin" => v match {
          case JArray(vs) => SetIn(k, vs.map(value), negated = true)
          case o => throw new IllegalArgumentException(s"$$nin wants array, got $o")
        }
        case "$contains"     => ArrContains(k, value(v), negated = false)
        case "$not_contains" => ArrContains(k, value(v), negated = true)
        case other => throw new IllegalArgumentException(s"bad op $other")
      }
      // implicit $eq: {"k": "v"}
      case (k, lit) => Cmp(k, "$eq", value(lit))
    }
    case JObject(fields) if fields.size > 1 => // implicit conjunction
      And(fields.map(f => fromJValue(JObject(List(f)))))
    case other => throw new IllegalArgumentException(s"bad where $other")
  }
}
