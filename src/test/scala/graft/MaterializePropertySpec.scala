package graft

import graft.operators.Materialize
import graft.operators.Materialize.{LogOp, Rec}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the WAL fold against a sequential in-memory oracle of
  * `operation.rs:16-34`: random per-id op sequences must materialize to the
  * same final state (mirrors the reference's hypothesis state machines,
  * `chromadb/test/property/test_embeddings.py`) — including the embedding
  * carried in the WAL record and the stable offset-id assignment
  * (`first_offset`: set when a record becomes live, kept by Update/Upsert
  * on a live record, re-assigned on add-after-delete). Both fold
  * implementations (typed lambdas and the Catalyst expression fold) are
  * checked against the same oracle.
  */
class MaterializePropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private val ids = (0 until 12).map(i => s"id$i")
  private val vecs: Seq[Option[Seq[Float]]] =
    Seq(None, Some(Seq(1f, 2f)), Some(Seq(3f, 4f)), Some(Seq(5f)))
  // null metadata value = tombstone (UpdateMetadataValue::None)
  private val genOp: Gen[(String, Option[String], Map[String, String], Option[Seq[Float]])] =
    for {
      op <- Gen.oneOf("Add", "Update", "Upsert", "Delete")
      doc <- Gen.option(Gen.oneOf("d1", "d2", "d3"))
      meta <- Gen.mapOf(Gen.zip(Gen.oneOf("k1", "k2"),
        Gen.oneOf[String]("v1", "v2", null)))
      emb <- Gen.oneOf(vecs)
    } yield (op, doc, meta, emb)

  private def oracleFold(ops: Seq[LogOp]): Option[Rec] = {
    var cur: Option[Rec] = None
    ops.sortBy(_.log_offset).foreach { o =>
      o.op match {
        case "Add" =>
          if (cur.isEmpty)
            cur = Some(Rec(o.id, o.document, o.meta.filter(_._2 != null),
              o.embedding, o.log_offset))
        case "Upsert" =>
          val off = cur.map(_.first_offset).getOrElse(o.log_offset)
          cur = Some(Rec(o.id, o.document, o.meta.filter(_._2 != null),
            o.embedding, off))
        case "Update" => cur = cur.map { c =>
          val merged = o.meta.foldLeft(c.meta) {
            case (m, (k, null)) => m - k
            case (m, (k, v))    => m.updated(k, v)
          }
          Rec(c.id, if (o.document.isDefined) o.document else c.document,
            merged,
            if (o.embedding.isDefined) o.embedding else c.embedding,
            c.first_offset)
        }
        case "Delete" => cur = None
      }
    }
    cur
  }

  private def randomWal(seed: Seed, n: Int = 80): Seq[LogOp] = {
    val params = Gen.Parameters.default
    Gen.listOfN(n, Gen.zip(Gen.oneOf(ids), genOp)).pureApply(params, seed)
      .zipWithIndex.map { case ((id, (op, doc, meta, emb)), off) =>
        LogOp(id, off.toLong, op, doc, meta, emb)
      }
  }

  private type State = (Option[String], Map[String, String], Option[Seq[Float]], Long)

  private def expectedOf(wal: Seq[LogOp]): Map[String, State] =
    wal.groupBy(_.id).flatMap { case (id, ops) =>
      oracleFold(ops).map(r =>
        id -> ((r.document, r.meta, r.embedding, r.first_offset)))
    }

  private def canonDf(df: org.apache.spark.sql.DataFrame): Map[String, State] =
    df.select("id", "document", "meta", "embedding", "first_offset")
      .collect().map { r =>
        r.getString(0) -> ((Option(r.getString(1)),
          r.getMap[String, String](2).toMap,
          Option(r.getSeq[Float](3)).map(_.toSeq),
          r.getLong(4)))
      }.toMap

  test("typed fold AND expression fold == sequential oracle over 10 random WALs") {
    import spark.implicits._
    for (caseIdx <- 0 until 10) {
      val wal = randomWal(Seed(caseIdx.toLong * 104729 + 7))
      val expected = expectedOf(wal)
      val typed = canonDf(Materialize(spark, wal.toDS()).toDF())
      assert(typed == expected, s"typed fold, case $caseIdx")
      val exprd = canonDf(Materialize.applyDf(wal.toDS().toDF()))
      assert(exprd == expected, s"expression fold, case $caseIdx")
    }
  }

  test("compactionMerge(applyDf(prefix), suffix) == applyDf(all) over random splits") {
    import spark.implicits._
    for (caseIdx <- 0 until 6) {
      val wal = randomWal(Seed(caseIdx.toLong * 31337 + 11))
      // compaction point at a pseudo-random offset inside the WAL
      val cut = (caseIdx * 23 + 17) % 60 + 10
      val walDf = wal.toDS().toDF()
      val segment = Materialize.applyDf(walDf.filter(s"log_offset < $cut"))
      val merged = Materialize.compactionMerge(
        segment, walDf.filter(s"log_offset >= $cut"))
      val full = Materialize.applyDf(walDf)
      assert(canonDf(merged) == canonDf(full), s"case $caseIdx cut=$cut")
    }
  }
}
