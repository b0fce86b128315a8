package graft

import graft.operators.Materialize
import graft.operators.Materialize.{LogOp, Rec}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the WAL fold against a sequential in-memory oracle of
  * `operation.rs:16-34`: random per-id op sequences must materialize to the
  * same final state (mirrors the reference's hypothesis state machines,
  * `chromadb/test/property/test_embeddings.py`).
  */
class MaterializePropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private val ids = (0 until 12).map(i => s"id$i")
  // null metadata value = tombstone (UpdateMetadataValue::None)
  private val genOp: Gen[(String, Option[String], Map[String, String])] = for {
    op <- Gen.oneOf("Add", "Update", "Upsert", "Delete")
    doc <- Gen.option(Gen.oneOf("d1", "d2", "d3"))
    meta <- Gen.mapOf(Gen.zip(Gen.oneOf("k1", "k2"),
      Gen.oneOf[String]("v1", "v2", null)))
  } yield (op, doc, meta)

  private def oracleFold(ops: Seq[LogOp]): Option[Rec] = {
    var cur: Option[Rec] = None
    ops.sortBy(_.log_offset).foreach { o =>
      o.op match {
        case "Add" =>
          if (cur.isEmpty) cur = Some(Rec(o.id, o.document, o.meta.filter(_._2 != null)))
        case "Upsert" => cur = Some(Rec(o.id, o.document, o.meta.filter(_._2 != null)))
        case "Update" => cur = cur.map { c =>
          val merged = o.meta.foldLeft(c.meta) {
            case (m, (k, null)) => m - k
            case (m, (k, v))    => m.updated(k, v)
          }
          Rec(c.id, if (o.document.isDefined) o.document else c.document, merged)
        }
        case "Delete" => cur = None
      }
    }
    cur
  }

  test("Materialize == sequential oracle over 10 random WALs") {
    import spark.implicits._
    val params = Gen.Parameters.default
    for (caseIdx <- 0 until 10) {
      val seed = Seed(caseIdx.toLong * 104729 + 7)
      val raw = Gen.listOfN(80, Gen.zip(Gen.oneOf(ids), genOp))
        .pureApply(params, seed)
      val wal = raw.zipWithIndex.map { case ((id, (op, doc, meta)), off) =>
        LogOp(id, off.toLong, op, doc, meta)
      }
      val got = Materialize(spark, wal.toDS()).collect()
        .map(r => r.id -> ((r.document, r.meta))).toMap
      val expected = wal.groupBy(_.id).flatMap { case (id, ops) =>
        oracleFold(ops).map(r => id -> ((r.document, r.meta)))
      }
      assert(got == expected, s"case $caseIdx\n got=$got\n exp=$expected")
    }
  }

  test("compactionMerge(applyDf(prefix), suffix) == applyDf(all) over random splits") {
    import spark.implicits._
    val params = Gen.Parameters.default
    for (caseIdx <- 0 until 6) {
      val seed = Seed(caseIdx.toLong * 31337 + 11)
      val raw = Gen.listOfN(80, Gen.zip(Gen.oneOf(ids), genOp))
        .pureApply(params, seed)
      val wal = raw.zipWithIndex.map { case ((id, (op, doc, meta)), off) =>
        LogOp(id, off.toLong, op, doc, meta)
      }
      // compaction point at a pseudo-random offset inside the WAL
      val cut = (caseIdx * 23 + 17) % 60 + 10
      val walDf = wal.toDS().toDF()
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), Option(r.getString(1)),
          r.getMap[String, String](2).toSeq.sorted.mkString(","))).toSet
      val segment = Materialize.applyDf(walDf.filter(s"log_offset < $cut"))
      val merged = Materialize.compactionMerge(
        segment, walDf.filter(s"log_offset >= $cut"))
      val full = Materialize.applyDf(walDf)
      assert(canon(merged) == canon(full),
        s"case $caseIdx cut=$cut\n merged=${canon(merged)}\n full=${canon(full)}")
    }
  }
}
