package graft

import graft.model.{SearchParser, Where}
import graft.operators.Rank
import org.scalatest.funsuite.AnyFunSuite

/** Wire-payload parsing: every serde production of the reference's
  * SearchPayload (`rust/types/src/execution/plan.rs:235`,
  * `operator.rs:1153-1192` RankExpr) maps onto the engine's typed
  * request.
  */
class SearchParserSpec extends AnyFunSuite {

  test("full payload: filter, nested rank, group_by, limit, select") {
    val r = SearchParser.parse(
      """{
        |  "filter": {"$and": [{"label": {"$gt": 1}}, {"even": true}]},
        |  "rank": {"$sum": [
        |    {"$mul": [{"$val": 0.7}, {"$knn": {"query": [1.0, 2.0], "limit": 50, "default": 2.0}}]},
        |    {"$knn": {"query": [0.5, 0.5], "return_rank": true}}]},
        |  "group_by": {"keys": ["label"], "aggregate": {"$max_k": {"keys": ["#score"], "k": 3}}},
        |  "limit": {"offset": 5, "limit": 10},
        |  "select": {"keys": ["#score", "#document", "label"]}
        |}""".stripMargin)
    assert(r.filter.contains(Where.And(Seq(
      Where.Cmp("label", "$gt", Where.VInt(1)),
      Where.Cmp("even", "$eq", Where.VBool(true))))))
    assert(r.leaves == Seq(
      SearchParser.KnnLeafDense(Seq(1.0f, 2.0f), 50),
      SearchParser.KnnLeafDense(Seq(0.5f, 0.5f), 16))) // default_knn_limit = 16
    r.rank match {
      case Rank.Sum(Seq(Rank.Mul(Seq(Rank.Val(w), Rank.Leaf(0, d, false))),
          Rank.Leaf(1, _, true))) =>
        assert(w == 0.7 && d == 2.0)
      case other => fail(s"rank shape: $other")
    }
    assert(r.groupBy.contains(SearchParser.Group(Seq("label"), 3, descending = true)))
    assert(r.limit.contains(10) && r.offset == 5)
    assert(r.select == Seq("#score", "#document", "label"))
  }

  test("sparse $knn leaf: object query with indices/values + key") {
    val r = SearchParser.parse(
      """{"rank": {"$knn": {"query": {"indices": [5, 1], "values": [0.5, 0.25]},
        |  "key": "tf_bow", "limit": 7}}}""".stripMargin)
    assert(r.leaves == Seq(
      SearchParser.KnnLeafSparse("tf_bow", Seq(5L, 1L), Seq(0.5f, 0.25f), 7)))
    // sparse without a key is rejected (the reference requires Key::field)
    intercept[IllegalArgumentException] {
      SearchParser.parse(
        """{"rank": {"$knn": {"query": {"indices": [1], "values": [1.0]}}}}""")
    }
    // length mismatch is rejected
    intercept[IllegalArgumentException] {
      SearchParser.parse(
        """{"rank": {"$knn": {"query": {"indices": [1, 2], "values": [1.0]},
          |  "key": "k"}}}""".stripMargin)
    }
  }

  test("text $knn leaf: string query parses to a server-embedded leaf") {
    val r = SearchParser.parse(
      """{"rank": {"$knn": {"query": "hello world", "limit": 9}}}""")
    assert(r.leaves == Seq(SearchParser.KnnLeafText("hello world", 9)))
    // a key other than #embedding marks the leaf sparse-by-schema
    val rk = SearchParser.parse(
      """{"rank": {"$knn": {"query": "hi", "key": "bm", "limit": 4}}}""")
    assert(rk.leaves == Seq(SearchParser.KnnLeafText("hi", 4, Some("bm"))))
  }

  test("multi-payload request: payloads array parses in order; single body unchanged") {
    val many = SearchParser.parseMany(
      """{"payloads": [
        |  {"rank": {"$knn": {"query": [1.0, 0.0], "limit": 5}}},
        |  {"rank": {"$val": 2.5}, "limit": {"limit": 3}}]}""".stripMargin)
    assert(many.size == 2)
    assert(many(0).leaves == Seq(SearchParser.KnnLeafDense(Seq(1.0f, 0.0f), 5)))
    assert(many(1).limit.contains(3))
    val one = SearchParser.parseMany("""{"rank": {"$val": 1.0}}""")
    assert(one.size == 1)
    intercept[IllegalArgumentException] {
      SearchParser.parseMany("""{"payloads": []}""")
    }
    // the HTTP wire envelope spells the field `searches`
    // (SearchRequestPayload, api_types.rs:2444-2450) — same parse
    val wire = SearchParser.parseMany(
      """{"searches": [
        |  {"rank": {"$knn": {"query": [1.0, 0.0], "limit": 5}}},
        |  {"rank": {"$val": 2.5}, "limit": {"limit": 3}}],
        | "read_level": "index_and_wal"}""".stripMargin)
    assert(wire.size == 2 && wire(1).limit.contains(3))
    intercept[IllegalArgumentException] {
      SearchParser.parseMany("""{"searches": []}""")
    }
    intercept[IllegalArgumentException] {
      SearchParser.parseMany(
        """{"payloads": [{"rank":{"$val":1.0}}],
          | "searches": [{"rank":{"$val":1.0}}]}""".stripMargin)
    }
  }

  test("defaults: no filter/group/limit/select; $knn default limit and no-default fill") {
    val r = SearchParser.parse("""{"rank": {"$knn": {"query": [1.5]}}}""")
    assert(r.filter.isEmpty && r.groupBy.isEmpty && r.limit.isEmpty
      && r.offset == 0 && r.select.isEmpty)
    r.rank match {
      case Rank.Leaf(0, d, false) => assert(d == Float.MaxValue.toDouble)
      case other => fail(s"$other")
    }
  }

  test("$sub/$div/$abs/$exp/$log/$min/$max compile; missing rank rejected") {
    val r = SearchParser.parse(
      """{"rank": {"$div": {
        |  "left": {"$abs": {"$sub": {"left": {"$val": 1}, "right": {"$val": 2}}}},
        |  "right": {"$max": [{"$exp": {"$val": 0}}, {"$log": {"$val": 1}},
        |            {"$min": [{"$val": 3}, {"$val": 4}]}]}}}}""".stripMargin)
    assert(r.leaves.isEmpty)
    r.rank match {
      case Rank.Div(Rank.Abs(Rank.Sub(Rank.Val(1.0), Rank.Val(2.0))), Rank.Max(_)) =>
      case other => fail(s"$other")
    }
    intercept[IllegalArgumentException] { SearchParser.parse("""{"filter": {}}""") }
    intercept[IllegalArgumentException] {
      SearchParser.parse("""{"rank": {"$nope": 1}}""")
    }
  }

  test("group_by without aggregate (or without keys) is inactive") {
    val noAgg = SearchParser.parse(
      """{"rank": {"$val": 1}, "group_by": {"keys": ["label"]}}""")
    assert(noAgg.groupBy.isEmpty)
    val noKeys = SearchParser.parse(
      """{"rank": {"$val": 1},
        | "group_by": {"aggregate": {"$min_k": {"keys": ["#score"], "k": 1}}}}""".stripMargin)
    assert(noKeys.groupBy.isEmpty)
  }
}
