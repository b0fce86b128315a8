package graft

import graft.api.Client
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Generative gate for the durable multi-writer WAL: TWO handles over
  * one collection run a seeded random interleaving of buffered writes,
  * `commitLog` appends, compactions, and full handle reopens
  * ("crashes"), against a driver-side oracle that applies each entry's
  * ops at its COMMITTED position — the linearization the log's claimed
  * entry order defines, independent of which handle buffered first.
  *
  * Properties, checked after every commit-bearing step and at the end
  * from a cold reopen:
  *   1. a fresh handle's state equals the oracle fold (durability:
  *      everything committed or compacted survives; nothing else is
  *      required to);
  *   2. the two live handles converge to the same state once both have
  *      folded the full log (their next commitLog refreshes them).
  *
  * The same realize-the-expected-state discipline as
  * [[TailMergePropertySpec]] — the oracle is a driver fold of the op
  * stream in commit order, independent of the code under test.
  */
class WalPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def df(rows: Seq[(String, String)]): DataFrame =
    rows.toDF("id", "document")

  for (seed <- Seq(11L, 41L)) {
    test(s"two writers, random commit/compact/crash interleaving (seed $seed)") {
      val rng = new scala.util.Random(seed)
      val root =
        java.nio.file.Files.createTempDirectory(s"graft_walprop_$seed").toString
      val client = new Client(spark, root)
      client.createCollection(s"wp_$seed")
      def open() = new Client(spark, root).getCollection(s"wp_$seed")

      var h1 = open(); var h2 = open()
      // oracle: live id -> document, advanced only at COMMIT points
      var oracle = Map.empty[String, String]
      // per-handle buffered ops not yet committed, in append order
      var buf1 = Vector.empty[(String, String, String)] // (op, id, doc)
      var buf2 = Vector.empty[(String, String, String)]

      def applyOp(st: Map[String, String],
          o: (String, String, String)): Map[String, String] = o match {
        case ("Add", id, doc) => if (st.contains(id)) st else st + (id -> doc)
        case ("Upsert", id, doc) => st + (id -> doc)
        case ("Delete", id, _) => st - id
        case _ => st
      }

      def stateOf(h: graft.api.CollectionHandle): Map[String, String] =
        h.get(include = Seq("document")).collect()
          .map(r => r.getAs[String]("id") -> r.getAs[String]("document")).toMap

      def buffer(which: Int): Unit = {
        val id = s"k-${rng.nextInt(20)}"
        val op = rng.nextInt(3) match {
          case 0 => ("Add", id, s"add-$which-${rng.nextInt(1000)}")
          case 1 => ("Upsert", id, s"ups-$which-${rng.nextInt(1000)}")
          case 2 => ("Delete", id, "")
        }
        val h = if (which == 1) h1 else h2
        op._1 match {
          case "Add" => h.add(df(Seq(op._2 -> op._3)))
          case "Upsert" => h.upsert(df(Seq(op._2 -> op._3)))
          case "Delete" => h.delete(Seq(op._2))
        }
        if (which == 1) buf1 :+= op else buf2 :+= op
      }

      def commit(which: Int): Unit = {
        if (which == 1) { h1.commitLog(); oracle = buf1.foldLeft(oracle)(applyOp); buf1 = Vector.empty }
        else { h2.commitLog(); oracle = buf2.foldLeft(oracle)(applyOp); buf2 = Vector.empty }
        // durability: a cold open folds exactly the committed prefix
        assert(stateOf(open()) == oracle, s"cold reopen after commit by h$which")
      }

      for (step <- 0 until 30) {
        rng.nextInt(10) match {
          case n if n < 5 => buffer(1 + rng.nextInt(2))
          case 5 | 6 => commit(1)
          case 7 => commit(2)
          case 8 => // compaction by a FRESH handle (sees only the log)
            val c = open()
            c.persist()
            assert(stateOf(open()) == oracle, "cold reopen after compaction")
          case 9 => // crash one handle: its uncommitted buffer dies
            if (rng.nextBoolean()) { h1 = open(); buf1 = Vector.empty }
            else { h2 = open(); buf2 = Vector.empty }
        }
      }
      // drain both buffers; convergence: both handles fold the full log
      commit(1); commit(2)
      h1.commitLog(); h2.commitLog() // no-op appends, but refresh both views
      assert(stateOf(h1) == oracle, "h1 converged")
      assert(stateOf(h2) == oracle, "h2 converged")
    }
  }

  /** The streamed FetchLog fold ([[graft.streaming.EventStream.walFold]])
    * against the same commit-order oracle: random op batches commit as
    * log entries; after every commit the CHECKPOINTED stream resumes,
    * consumes only the new entries, and the union of everything it has
    * ever emitted must materialize to the oracle state — catch-up
    * semantics under random Add/Upsert/Update/Delete interleavings,
    * including Add-on-live (which plain max-offset LWW would get wrong).
    */
  for (seed <- Seq(7L, 23L)) {
    test(s"streamed fold equals the commit-order oracle (seed $seed)") {
      import graft.streaming.EventStream
      import graft.sources.WalStore
      val rng = new scala.util.Random(seed)
      val root =
        java.nio.file.Files.createTempDirectory(s"graft_walstr_$seed").toString
      val client = new Client(spark, root)
      client.createCollection(s"ws_$seed")
      def open() = new Client(spark, root).getCollection(s"ws_$seed")

      var oracle = Map.empty[String, String]
      val ckpt = s"$root/stream_ckpt"
      val emitted = scala.collection.mutable.ArrayBuffer[
        (String, Long, String, Option[String])]()
      def drain(dataRoot: String): Unit = {
        val q = EventStream.walFold(WalStore.streamEntries(spark, dataRoot))
          .toDF().writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
          .foreachBatch { (df: DataFrame, _: Long) =>
            emitted.synchronized {
              emitted ++= df.collect().map(r => (r.getString(0), r.getLong(1),
                r.getString(2), Option(r.getString(3))))
            }; ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      def materialized: Map[String, String] = emitted.synchronized {
        emitted.groupBy(_._1).map { case (id, rows) => id -> rows.maxBy(_._2) }
          .collect { case (id, (_, _, "Live", doc)) => id -> doc.getOrElse("") }
          .toMap
      }

      for (round <- 0 until 4) {
        val h = open()
        var buf = Vector.empty[(String, String, String)]
        for (_ <- 0 until (1 + rng.nextInt(5))) {
          val id = s"k-${rng.nextInt(10)}"
          val op = rng.nextInt(4) match {
            case 0 => ("Add", id, s"add-${rng.nextInt(1000)}")
            case 1 => ("Upsert", id, s"ups-${rng.nextInt(1000)}")
            case 2 => ("Update", id, s"upd-${rng.nextInt(1000)}")
            case 3 => ("Delete", id, "")
          }
          op._1 match {
            case "Add" => h.add(df(Seq(op._2 -> op._3)))
            case "Upsert" => h.upsert(df(Seq(op._2 -> op._3)))
            case "Update" => h.update(df(Seq(op._2 -> op._3)))
            case "Delete" => h.delete(Seq(op._2))
          }
          buf :+= op
        }
        h.commitLog()
        oracle = buf.foldLeft(oracle) { (st, o) =>
          o match {
            case ("Add", id, d) => if (st.contains(id)) st else st + (id -> d)
            case ("Upsert", id, d) => st + (id -> d)
            case ("Update", id, d) => if (st.contains(id)) st + (id -> d) else st
            case ("Delete", id, _) => st - id
            case _ => st
          }
        }
        drain(h.ref.dataRoot)
        assert(materialized == oracle, s"round $round diverged " +
          s"(missing=${(oracle.toSet -- materialized.toSet).take(3)} " +
          s"extra=${(materialized.toSet -- oracle.toSet).take(3)})")
      }
    }
  }
}
