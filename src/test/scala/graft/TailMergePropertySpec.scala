package graft

import graft.api.Client
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Generative gate for the IndexAndWal merge: a seeded random op
  * sequence (add / upsert / update / delete, batch-shaped) with a
  * compaction dropped in the middle, then two properties:
  *
  *   1. the facade state equals a driver-side fold of the same ops
  *      (the WAL state machine, `rust/types/src/operation.rs:16-34`);
  *   2. `queryAnn` with an exhaustive probe (nprobe == nCentroids)
  *      returns EXACTLY the brute-force in-plan KNN over that state —
  *      the index leg + KnnLog tail leg + shadowing + over-fetch
  *      compose to the precise answer, for ANY interleaving of
  *      compaction and writes.
  *
  * This is the realize-the-expected-state flavor of property testing
  * that caught the round-3 optimizer bug — the oracle is independent
  * of the code under test.
  */
class TailMergePropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dim = 4

  private def randVec(rng: scala.util.Random): Seq[Float] =
    Seq.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)

  private def df(rows: Seq[(String, Seq[Float])]): DataFrame =
    rows.toDF("id", "embedding")

  for (seed <- Seq(7L, 23L)) {
    test(s"random ops + mid-sequence compaction: served == exact (seed $seed)") {
      val rng = new scala.util.Random(seed)
      val client = new Client(spark,
        java.nio.file.Files.createTempDirectory(s"graft_prop_$seed").toString)
      val coll = client.createCollection(s"prop_$seed")

      // driver-side oracle of the live state: id -> embedding
      var live = Map.empty[String, Seq[Float]]
      def ids(n: Int): Seq[String] = (0 until n).map(i => s"r-$i")

      // base segment
      val base = ids(30).map(_ -> randVec(rng))
      coll.add(df(base)); live ++= base
      coll.persist()

      // random tail ops in small batches; compact once mid-way
      for (step <- 0 until 24) {
        if (step == 12) { coll.persist() } // second compaction mid-sequence
        rng.nextInt(4) match {
          case 0 => // add: new id wins, live id ignored
            val rows = Seq.fill(1 + rng.nextInt(3))(
              s"r-${rng.nextInt(50)}" -> randVec(rng)).distinctBy(_._1)
            coll.add(df(rows))
            rows.foreach { case (id, v) =>
              if (!live.contains(id)) live += id -> v }
          case 1 => // upsert: replace or insert
            val rows = Seq.fill(1 + rng.nextInt(3))(
              s"r-${rng.nextInt(50)}" -> randVec(rng)).distinctBy(_._1)
            coll.upsert(df(rows)); live ++= rows
          case 2 => // update: merge into live ids only
            val rows = Seq.fill(1 + rng.nextInt(3))(
              s"r-${rng.nextInt(50)}" -> randVec(rng)).distinctBy(_._1)
            coll.update(df(rows))
            rows.foreach { case (id, v) =>
              if (live.contains(id)) live += id -> v }
          case 3 => // delete: live ids only (facade delete is by id)
            if (live.nonEmpty) {
              val victim = live.keys.toSeq.sorted.apply(
                rng.nextInt(live.size))
              coll.delete(Seq(victim)); live -= victim
            }
        }
      }

      // property 1: facade state == driver fold
      val got = coll.state.collect()
        .map(r => r.id -> r.embedding.get.toSeq).toMap
      assert(got == live,
        s"state diverged: only-engine=${(got.keySet -- live.keySet).take(5)} " +
          s"only-oracle=${(live.keySet -- got.keySet).take(5)}")

      // property 2: exhaustive-probe served read == exact in-plan KNN
      val queries = (0 until 3)
        .map(i => (i.toLong, randVec(rng))).toDF("query_id", "q_embedding")
      val exact = coll.asCollection
        .query(queries, k = 5, space = "cosine")
        .select("query_id", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
      val served = coll.queryAnn(queries, k = 5, nprobe = 8, nCentroids = 8)
        .select("query_id", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
      assert(served == exact,
        s"merge diverged from exact: ${served.toSet diff exact.toSet}")
    }
  }
}
