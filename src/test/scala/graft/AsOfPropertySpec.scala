package graft

import graft.operators.AsOfJoin
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the single-shuffle as-of join against a brute-force
  * in-memory oracle: for random (key, ts) row sets, every left row must
  * pair with the right row a direct O(n²) scan selects — latest-at-or-
  * before (backward) / earliest-at-or-after (forward), tolerance applied,
  * ties broken deterministically.
  */
class AsOfPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)

  private val genRows: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] = {
    // (id, key, tsSec) with small domains so collisions and ties happen
    val row = for {
      key <- Gen.chooseNum(0L, 3L)
      t <- Gen.chooseNum(0L, 20L)
    } yield (key, t)
    for {
      ls <- Gen.listOfN(25, row)
      rs <- Gen.listOfN(25, row)
    } yield (
      ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      rs.zipWithIndex.map { case ((k, t), i) => (1000L + i, k, t) })
  }

  private def oracle(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
      direction: String, tolSec: Long): Map[Long, Option[Long]] =
    left.map { case (lid, lk, lt) =>
      val cands = right.filter { case (_, rk, rt) =>
        rk == lk && (if (direction == "backward") rt <= lt else rt >= lt) &&
          (if (direction == "backward") lt - rt else rt - lt) <= tolSec
      }
      val pick =
        if (cands.isEmpty) None
        else if (direction == "backward")
          // latest ts; among ties the LARGEST tiebreak id
          Some(cands.maxBy { case (rid, _, rt) => (rt, rid) }._1)
        else
          // earliest ts; among ties the SMALLEST tiebreak id
          Some(cands.minBy { case (rid, _, rt) => (rt, rid) }._1)
      lid -> pick
    }.toMap

  test("asof == brute-force oracle over random keys/timestamps, both directions") {
    import spark.implicits._
    val cases = Gen.listOfN(6, genRows)
      .apply(Gen.Parameters.default, Seed(42L)).get
    for ((ls, rs) <- cases; direction <- Seq("backward", "forward");
         tolSec <- Seq(5L, Long.MaxValue / 2000000)) {
      val left = ls.map { case (i, k, t) => (i, k, ts(t)) }
        .toDF("event_id", "user_id", "ts")
      val right = rs.map { case (i, k, t) => (i, k, ts(t)) }
        .toDF("match_id", "user_id", "ts")
      val got = AsOfJoin.asof(left, right, "user_id", "ts", "match_id",
          Seq("match_id"), direction, tolSec * 1000000L)
        .select("event_id", "match_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val want = oracle(ls, rs, direction, tolSec)
      assert(got == want,
        s"direction=$direction tol=$tolSec\n" +
          s"diff=${(got.toSet diff want.toSet).take(5)} want=${(want.toSet diff got.toSet).take(5)}")
    }
  }
}
