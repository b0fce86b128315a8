package graft

import graft.plans.RegexPrefilter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RegexPrefilterSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mandatory literal extraction") {
    assert(RegexPrefilter.mandatoryLiteral("sort (merge|scan)").isEmpty) // alternation → bail
    assert(RegexPrefilter.mandatoryLiteral("hello.*world") == Some("hello")) // equal lengths → stable sort keeps first
    assert(RegexPrefilter.mandatoryLiteral("ab") == None) // too short
    assert(RegexPrefilter.mandatoryLiteral("a+bcdef") == Some("bcdef")) // char before quantifier dropped
    // Groups and classes bail out: '(abc)?xyz' matches "xyz" (no 'abc'),
    // 'ab[x-z]cd' never contains the literal 'x-z' — a run inside/near
    // either is not mandatory, so the rule must not inject Contains.
    assert(RegexPrefilter.mandatoryLiteral("(abc)?xyz").isEmpty)
    assert(RegexPrefilter.mandatoryLiteral("ab[x-z]cd").isEmpty)
    assert(RegexPrefilter.mandatoryLiteral("filter[0-9]+stream").isEmpty)
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
