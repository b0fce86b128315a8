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
    assert(RegexPrefilter.mandatoryLiteral("filter[0-9]+stream") == Some("filter"))
    assert(RegexPrefilter.mandatoryLiteral("a+bcdef") == Some("bcdef")) // char before quantifier dropped
  }

  test("regex filter gains a pushed StringContains prefilter") {
    val df = Tables.documents(spark, sf).filter(col("text").rlike("sort merge.*scan"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StringContains"), plan.take(800))
    assert(plan.contains("RLIKE") || plan.contains("rlike"), plan.take(800))
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
