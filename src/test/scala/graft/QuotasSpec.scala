package graft

import graft.api.{Client, Quotas}
import graft.model.Where
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's published quota envelope
  * (`docs/mintlify/cloud/quotas-limits.mdx`) enforced at the client edge:
  * predicate count, regex bytes, result k, batch size, embedding width.
  * Unlimited collections must skip every check (and the data-plane jobs
  * the checks would cost).
  */
class QuotasSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def freshClient(limits: Quotas.Limits) = {
    val root = java.nio.file.Files.createTempDirectory("quotas").toString
    new Client(spark, root, limits = limits)
  }

  private def wide(n: Int): Where.Expr =
    Where.And((1 to n).map(i => Where.Cmp(s"k$i", "$eq", Where.VStr("v"))))

  test("predicate count: leaves are counted through nesting, connectives are not") {
    assert(Quotas.predicateCount(wide(8)) == 8)
    val nested = Where.Or(Seq(wide(4), Where.And(Seq(wide(3),
      Where.DocContains("x", negated = false)))))
    assert(Quotas.predicateCount(nested) == 8)
  }

  test("cloud limits reject over-envelope queries and writes") {
    val c = freshClient(Quotas.CloudDefaults)
    val col1 = c.createCollection("q")
    col1.add(Seq(("a", "doc a"), ("b", "doc b")).toDF("id", "document"))

    // 9 predicates > 8
    intercept[Quotas.QuotaExceeded] { col1.get(where = Some(wide(9))) }
    // regex needle over 256 bytes
    intercept[Quotas.QuotaExceeded] {
      col1.get(where = Some(Where.DocContains("x" * 257, negated = false)))
    }
    // k > 300
    intercept[Quotas.QuotaExceeded] {
      col1.query(Seq((0L, Seq(1f, 0f))).toDF("query_id", "q_embedding"), k = 301)
    }
    // batch of 301 > 300
    intercept[Quotas.QuotaExceeded] {
      col1.add(spark.range(301).select(
        col("id").cast("string").as("id"), lit("d").as("document")))
    }
    // 4097-dim embedding > 4096
    intercept[Quotas.QuotaExceeded] {
      col1.add(Seq(("z", "doc z", Seq.fill(4097)(0f)))
        .toDF("id", "document", "embedding"))
    }
    // in-envelope traffic still flows
    assert(col1.get(where = Some(wide(8))).count() == 0)
    assert(col1.count() == 2)
  }

  test("size ceiling is op-aware: update/upsert of live ids pass at the cap") {
    val tiny = Quotas.CloudDefaults.copy(maxRecordsPerCollection = 3L)
    val c = freshClient(tiny)
    val col1 = c.createCollection("cap")
    col1.add(Seq(("a", "da"), ("b", "db"), ("c", "dc")).toDF("id", "document"))
    // at the cap: updates and upserts of EXISTING ids must not be
    // rejected (they replace, not grow)
    col1.update(Seq(("a", "da2")).toDF("id", "document"))
    col1.upsert(Seq(("b", "db2"), ("c", "dc2")).toDF("id", "document"))
    assert(col1.count() == 3)
    // a genuinely new id past the cap still trips
    intercept[Quotas.QuotaExceeded] {
      col1.add(Seq(("d", "dd")).toDF("id", "document"))
    }
    // mixed upsert (1 live + 1 fresh) exceeds: 3 + 1 new > 3
    intercept[Quotas.QuotaExceeded] {
      col1.upsert(Seq(("a", "da3"), ("e", "de")).toDF("id", "document"))
    }
  }

  test("dim quota checks the batch MAX, not the first embedded row") {
    val c = freshClient(Quotas.CloudDefaults)
    val col1 = c.createCollection("dims")
    intercept[Quotas.QuotaExceeded] {
      col1.add(Seq(
        ("ok", "d1", Seq.fill(4)(0f)),          // first row within limits
        ("bad", "d2", Seq.fill(4097)(0f)))      // second row over
        .toDF("id", "document", "embedding"))
    }
  }

  test("importJsonl chunks a dump larger than maxBatchRecords") {
    val root = java.nio.file.Files.createTempDirectory("quotas").toString
    // the dump is produced unlimited; the IMPORT side runs under quota
    val src = new Client(spark, root).createCollection("dump_big_src")
    src.add(spark.range(650).select(
      format_string("id%04d", col("id")).as("id"), lit("doc").as("document")))
    val c = new Client(spark, root, limits = Quotas.CloudDefaults)
    val path = java.nio.file.Files.createTempDirectory("dump").toString + "/d"
    src.exportJsonl(path)
    val dst = c.createCollection("dump_big_dst")
    dst.importJsonl(path) // 650 > 300: must chunk, not throw
    assert(dst.count() == 650)
  }

  test("unlimited collections skip enforcement") {
    val c = freshClient(Quotas.Unlimited)
    val col1 = c.createCollection("u")
    col1.add(spark.range(301).select(
      col("id").cast("string").as("id"), lit("d").as("document")))
    assert(col1.get(where = Some(wide(9))).count() == 0)
    assert(col1.count() == 301)
  }
}
