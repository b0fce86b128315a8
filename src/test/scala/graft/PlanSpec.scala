package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape gates — the scale properties the engine is designed
  * around must stay visible in the plan, or a refactor silently turned a
  * map-side design into a shuffle-everything design.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q6: filters push into the parquet scan and schema is pruned") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(500))
    assert(p.contains("partial_sum"), "aggregate must be partial (map-side)")
    assert(!p.contains("l_orderkey"), "unused columns must be pruned from the scan")
  }

  test("q5: dimension joins broadcast; fact table never pre-shuffled") {
    val p = plan("q5_local_volume")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "dims should broadcast, not sort-merge")
  }

  test("knn: top-k is a partial aggregate (k rows per partition shuffle)") {
    val p = plan("vs_knn_cosine")
    assert(p.contains("partial_topkagg"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin"), "queries must broadcast")
    assert(!p.contains("Window"), "window top-k would shuffle every candidate row")
  }

  test("knn: distance kernel runs inline in the projection (codegen), not a UDF") {
    val p = plan("vs_knn_cosine")
    assert(p.contains("cosine_similarity"), p.take(800))
    assert(!p.toLowerCase.contains("batchevalpython"))
  }
}
