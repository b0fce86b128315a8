package graft

import graft.model.{Where, WhereParser}
import graft.model.Where._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for Where corners the oracle queries don't reach: typed
  * array $contains variants and every WhereParser form.
  */
class WhereUnitSpec extends AnyFunSuite {
  import SparkTestSession._

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("document", StringType),
    StructField("meta_str", MapType(StringType, StringType)),
    StructField("meta_int", MapType(StringType, LongType)),
    StructField("meta_float", MapType(StringType, DoubleType)),
    StructField("meta_bool", MapType(StringType, BooleanType)),
    StructField("meta_str_arr", MapType(StringType, ArrayType(StringType))),
    StructField("meta_int_arr", MapType(StringType, ArrayType(LongType))),
    StructField("meta_float_arr", MapType(StringType, ArrayType(DoubleType))),
    StructField("meta_bool_arr", MapType(StringType, ArrayType(BooleanType)))))

  private def df = {
    val rows = Seq(
      Row("r1", "alpha doc", Map("k" -> "v"), Map("n" -> 5L), Map("f" -> 1.5),
        Map("b" -> true), Map("tags" -> Seq("x", "y")), Map("ns" -> Seq(1L, 2L)),
        Map("fs" -> Seq(0.5, 2.5)), Map("bs" -> Seq(true))),
      Row("r2", "beta doc", Map[String, String](), Map[String, Long](),
        Map[String, Double](), Map[String, Boolean](), Map[String, Seq[String]](),
        Map[String, Seq[Long]](), Map[String, Seq[Double]](), Map[String, Seq[Boolean]]()))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  private def idsFor(e: Expr): Set[String] =
    df.filter(Where.compile(e)).select("id").collect().map(_.getString(0)).toSet

  test("typed array $contains / $not_contains with missing keys") {
    assert(idsFor(ArrContains("tags", VStr("x"), negated = false)) == Set("r1"))
    assert(idsFor(ArrContains("tags", VStr("x"), negated = true)) == Set("r2")) // absent → true
    assert(idsFor(ArrContains("ns", VInt(2), negated = false)) == Set("r1"))
    assert(idsFor(ArrContains("fs", VFloat(2.5), negated = false)) == Set("r1"))
    assert(idsFor(ArrContains("bs", VBool(true), negated = false)) == Set("r1"))
    assert(idsFor(ArrContains("ns", VInt(9), negated = false)) == Set())
  }

  test("parser: every DSL form round-trips to the right AST") {
    assert(WhereParser.parse("""{"k": "v"}""") == Cmp("k", "$eq", VStr("v")))
    assert(WhereParser.parse("""{"n": {"$gt": 3}}""") == Cmp("n", "$gt", VInt(3)))
    assert(WhereParser.parse("""{"f": {"$lte": 1.5}}""") == Cmp("f", "$lte", VFloat(1.5)))
    assert(WhereParser.parse("""{"n": {"$in": [1, 2]}}""") ==
      SetIn("n", Seq(VInt(1), VInt(2)), negated = false))
    assert(WhereParser.parse("""{"$document": {"$contains": "x"}}""") ==
      DocContains("x", negated = false))
    assert(WhereParser.parse("""{"$document": {"$not_regex": "a.b"}}""") ==
      DocRegex("a.b", negated = true))
    assert(WhereParser.parse("""{"#id": {"$in": ["a", "b"]}}""") == IdIn(Seq("a", "b")))
    assert(WhereParser.parse("""{"$and": [{"a": 1}, {"b": 2}]}""") ==
      And(Seq(Cmp("a", "$eq", VInt(1)), Cmp("b", "$eq", VInt(2)))))
    // implicit conjunction over multiple fields
    assert(WhereParser.parse("""{"a": 1, "b": {"$ne": "x"}}""") ==
      And(Seq(Cmp("a", "$eq", VInt(1)), Cmp("b", "$ne", VStr("x")))))
    intercept[IllegalArgumentException](WhereParser.parse("""{"a": {"$bogus": 1}}"""))
  }

  test("parser rejects regexes outside the Rust-regex subset, accepts the subset") {
    def reject(p: String) = intercept[IllegalArgumentException](
      WhereParser.parse(s"""{"$$document": {"$$regex": "$p"}}"""))
    reject("(?=abc)def")        // look-ahead
    reject("(?!abc)def")        // negative look-ahead
    reject("(?<=a)b")           // look-behind
    reject("(?<!a)b")           // negative look-behind
    reject("(?>ab)c")           // atomic group
    reject("(a)\\\\1")          // backreference
    reject("(?<g>a)\\\\k<g>")   // named backreference
    // the allowed Rust surface parses fine
    assert(WhereParser.parse("""{"$document": {"$regex": "(?:ab)+c"}}""") ==
      DocRegex("(?:ab)+c", negated = false))
    assert(WhereParser.parse("""{"$document": {"$regex": "(?i)abc"}}""") ==
      DocRegex("(?i)abc", negated = false))
    assert(WhereParser.parse("""{"$document": {"$not_regex": "(?<name>a)b"}}""") ==
      DocRegex("(?<name>a)b", negated = true))
    assert(WhereParser.parse("""{"$document": {"$regex": "a\\0b"}}""") ==
      DocRegex("a\\0b", negated = false))
  }

  test("parsed where compiles and filters like the hand-built AST") {
    val json = """{"$or": [{"n": {"$gte": 5}}, {"$document": {"$contains": "beta"}}]}"""
    assert(idsFor(WhereParser.parse(json)) == Set("r1", "r2"))
    val json2 = """{"$and": [{"k": "v"}, {"b": {"$eq": true}}]}"""
    assert(idsFor(WhereParser.parse(json2)) == Set("r1"))
  }

  test("mandatoryContains: And unions, Or intersects, negation contributes none") {
    import Where._
    val c1 = DocContains("alpha", negated = false)
    val c2 = DocContains("betaX", negated = false)
    val neg = DocContains("gamma", negated = true)
    val cmp = Cmp("k", "$eq", VStr("v"))
    assert(mandatoryContains(And(Seq(c1, cmp, neg))) == Seq("alpha"))
    assert(mandatoryContains(And(Seq(c1, c2))).toSet == Set("alpha", "betaX"))
    // Or: a needle prunes only if required by every branch
    assert(mandatoryContains(Or(Seq(c1, c2))).isEmpty)
    assert(mandatoryContains(Or(Seq(And(Seq(c1, cmp)), c1))) == Seq("alpha"))
    // under Or with a non-document branch nothing is mandatory
    assert(mandatoryContains(Or(Seq(c1, cmp))).isEmpty)
    // short needles can't hit a trigram index
    assert(mandatoryContains(DocContains("ab", negated = false)).isEmpty)
  }

  test("containsDnf: Or alternates, And cross-products, unconstrained branches poison") {
    import Where._
    val c1 = DocContains("alpha", negated = false)
    val c2 = DocContains("betaX", negated = false)
    val c3 = DocContains("delta", negated = false)
    val cmp = Cmp("k", "$eq", VStr("v"))
    assert(containsDnf(Or(Seq(c1, c2))) ==
      Some(Seq(Seq("alpha"), Seq("betaX"))))
    assert(containsDnf(And(Seq(Or(Seq(c1, c2)), c3))) ==
      Some(Seq(Seq("alpha", "delta"), Seq("betaX", "delta"))))
    // a metadata-only Or branch is unconstrained → whole Or is True
    assert(containsDnf(Or(Seq(c1, cmp))).isEmpty)
    // but an And keeps pruning from its constrained side
    assert(containsDnf(And(Seq(c1, cmp))) == Some(Seq(Seq("alpha"))))
    // negation never donates
    assert(containsDnf(DocContains("gamma", negated = true)).isEmpty)
    // single-conjunction case agrees with mandatoryContains
    assert(containsDnf(And(Seq(c1, c2))) == Some(Seq(Seq("alpha", "betaX"))))
  }
}
