package graft

import graft.plans.RegexPrefilter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RegexPrefilterSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mandatory literal extraction") {
    // alternation → no SINGLE pushable literal (the DNF carries it)
    assert(RegexPrefilter.mandatoryLiteral("sort (merge|scan)").isEmpty)
    assert(RegexPrefilter.mandatoryLiteral("hello.*world") == Some("hello")) // first of the equal-length maxima
    assert(RegexPrefilter.mandatoryLiteral("ab") == None) // too short
    assert(RegexPrefilter.mandatoryLiteral("a+bcdef") == Some("bcdef")) // char before quantifier dropped
    // An OPTIONAL group is True but its neighbors stay mandatory: every
    // match of '(abc)?xyz' contains "xyz". A class is opaque and its
    // short neighbors ("ab", "cd") fall below the trigram floor.
    assert(RegexPrefilter.mandatoryLiteral("(abc)?xyz") == Some("xyz"))
    assert(RegexPrefilter.mandatoryLiteral("ab[x-z]cd").isEmpty)
    assert(RegexPrefilter.mandatoryLiteral("filter[0-9]+stream") == Some("filter"))
  }

  test("literal DNF: alternation-aware extraction (literal_expr.rs shape)") {
    import RegexPrefilter.literalDnf
    assert(literalDnf("(foo|bar)baz") ==
      Some(Seq(Seq("foo", "baz"), Seq("bar", "baz"))))
    assert(literalDnf("abc|defg") == Some(Seq(Seq("abc"), Seq("defg"))))
    // one unconstrained alternative poisons the whole disjunction
    assert(literalDnf("abc|de").isEmpty)
    assert(literalDnf("(sort|hash) (merge|join)") ==
      Some(Seq(Seq("sort", "merge"), Seq("sort", "join"),
        Seq("hash", "merge"), Seq("hash", "join"))))
    // cross-product blowup past MaxAlts bails to the full scan
    assert(literalDnf(
      "(aaa|bbb)(ccc|ddd)(eee|fff)(ggg|hhh)(iii|jjj)").isEmpty)
    // `+` keeps its element mandatory but breaks the run
    assert(literalDnf("abcd+efgh") == Some(Seq(Seq("abc", "efgh"))))
  }

  test("regex filter gains a pushed StringContains prefilter") {
    val df = Tables.documents(spark, sf).filter(col("text").rlike("sort merge.*scan"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StringContains"), plan.take(800))
    assert(plan.contains("RLIKE") || plan.contains("rlike"), plan.take(800))
  }

  test("optional group does not drop legitimate matches") {
    import spark.implicits._
    // "xyzzy" matches '(abc)?xyz' without containing 'abc'; a buggy
    // prefilter Contains('abc') would drop it.
    val n = Seq("xyzzy", "abcxyz", "nope").toDF("t")
      .filter(col("t").rlike("(abc)?xyz")).count()
    assert(n == 2)
  }

  test("rewrite preserves results") {
    val n1 = Tables.documents(spark, sf)
      .filter(col("text").rlike("sort merge.*scan")).count()
    // reference computation without regex (contains-chain is implied superset)
    val sup = Tables.documents(spark, sf)
      .filter(col("text").contains("sort merge")).count()
    assert(n1 <= sup)
  }
}
