package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics gates for the as-of join: inclusive bound at equal
  * timestamps, deterministic tie-break among equal right rows, null
  * payload when nothing precedes, and per-key isolation.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof picks latest right <= left.ts, inclusive, per key, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")), // after r2
      (2L, 10L, ts("2024-01-01 00:00:02")), // exactly at r1 -> inclusive
      (3L, 10L, ts("2024-01-01 00:00:01")), // before any right
      (4L, 20L, ts("2024-01-01 00:00:09"))  // other key: only its own rights
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:02")),
      (101L, 10L, ts("2024-01-01 00:00:04")),
      (102L, 20L, ts("2024-01-01 00:00:03"))
    ).toDF("click_id", "user_id", "ts")

    val out = AsOfJoin.asof(left, right, "user_id", "ts", "click_id", Seq("click_id"))
      .orderBy("event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq === Seq(1L -> 101L, 2L -> 100L, 3L -> -1L, 4L -> 102L))
  }

  test("equal (key, ts) right rows tie-break to the largest tiebreak value") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:05"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (200L, 10L, ts("2024-01-01 00:00:03")),
      (201L, 10L, ts("2024-01-01 00:00:03"))
    ).toDF("click_id", "user_id", "ts")
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "click_id", Seq("click_id"))
      .select("click_id").as[Long].collect()
    assert(out.toSeq === Seq(201L))
  }

  test("plan shape: exactly one exchange (the key window), no range cross-join") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:05"))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, ts("2024-01-01 00:00:02"))).toDF("click_id", "user_id", "ts")
    val plan = AsOfJoin.asof(left, right, "user_id", "ts", "click_id", Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"asof must not range-join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
  }
}
