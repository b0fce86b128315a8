package graft

import graft.api.{Client, ReadLevel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `ReadLevel` surface parity — the reference's
  * `rust/types/src/execution/plan.rs:550-565`: IndexAndWal (default,
  * full read-your-writes), IndexOnly (compacted segment only — the
  * un-compacted tail invisible), IndexAndBoundedWal (index + a
  * CONSISTENT prefix of the first n WAL entries since compaction).
  */
class ReadLevelSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def freshClient() = new Client(spark,
    java.nio.file.Files.createTempDirectory("rl").toString)

  private def docsOf(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select("id", "document").collect()
      .map(r => r.getString(0) -> Option(r.getString(1)).getOrElse("∅")).toMap

  test("get: IndexOnly sees the segment, IndexAndWal the tail, bounded a prefix") {
    val c = freshClient()
    val coll = c.createCollection("rl1")
    coll.add(Seq(("a", "one"), ("b", "two")).toDF("id", "document"))
    coll.persist() // compaction: a/b are the index
    // three tail entries, in log order
    coll.add(Seq(("c", "three")).toDF("id", "document"))    // entry 1
    coll.update(Seq(("a", "one EDITED")).toDF("id", "document")) // entry 2
    coll.delete(Seq("b"))                                    // entry 3

    assert(docsOf(coll.get()) ==
      Map("a" -> "one EDITED", "c" -> "three"),
      "IndexAndWal must see every committed write")
    assert(docsOf(coll.get(readLevel = ReadLevel.IndexOnly)) ==
      Map("a" -> "one", "b" -> "two"),
      "IndexOnly must read the compacted segment alone")
    assert(docsOf(coll.get(readLevel = ReadLevel.IndexAndBoundedWal(1))) ==
      Map("a" -> "one", "b" -> "two", "c" -> "three"),
      "bounded(1) folds exactly the first tail entry")
    assert(docsOf(coll.get(readLevel = ReadLevel.IndexAndBoundedWal(2))) ==
      Map("a" -> "one EDITED", "b" -> "two", "c" -> "three"),
      "bounded(2) folds the first two entries")
    assert(docsOf(coll.get(readLevel = ReadLevel.IndexAndBoundedWal(99))) ==
      docsOf(coll.get()),
      "a bound past the tail equals IndexAndWal")
    // the prefix is CONSISTENT, not per-id: a later entry on an id the
    // prefix already touched stays invisible
    coll.update(Seq(("c", "three EDITED")).toDF("id", "document")) // entry 4
    assert(docsOf(coll.get(readLevel = ReadLevel.IndexAndBoundedWal(1)))
        .get("c").contains("three"),
      "an op in a later entry must not leak into the prefix read")
    // count carries the level too (the reference's Count plan Scan)
    assert(coll.count() == 2)
    assert(coll.count(readLevel = ReadLevel.IndexOnly) == 2) // a, b
    assert(coll.count(readLevel = ReadLevel.IndexAndBoundedWal(1)) == 3)
    // after compaction the tail is empty: every level agrees
    coll.persist()
    val all = docsOf(coll.get())
    assert(docsOf(coll.get(readLevel = ReadLevel.IndexOnly)) == all)
    assert(docsOf(coll.get(readLevel = ReadLevel.IndexAndBoundedWal(1))) == all)
    assert(coll.count(readLevel = ReadLevel.IndexOnly) == coll.count())
  }

  test("search WIRE envelope carries read_level (plan.rs:588-592)") {
    val c = freshClient()
    val coll = c.createCollection("rl4")
    coll.add(Seq(("s1", "alpha doc", Seq(1.0f, 0.0f)))
      .toDF("id", "document", "embedding"))
    coll.persist()
    coll.add(Seq(("s2", "alpha tail", Seq(0.9f, 0.1f)))
      .toDF("id", "document", "embedding"))
    def ids(payload: String): Set[String] =
      coll.search(payload).select("id").collect().map(_.getString(0)).toSet
    val base = """"filter": {"$document": {"$contains": "alpha"}},
      |"rank": {"$knn": {"query": [1.0, 0.0], "limit": 10}},
      |"select": {"keys": []}""".stripMargin
    assert(ids(s"""{"read_level": "index_and_wal", $base}""") ==
      Set("s1", "s2"))
    assert(ids(s"""{"read_level": "index_only", $base}""") == Set("s1"),
      "wire index_only must exclude the un-compacted tail record")
    assert(ids(s"""{$base}""") == Set("s1", "s2"),
      "no wire field keeps the programmatic default (IndexAndWal)")
    // the wire field WINS over the programmatic default
    assert(coll.search(s"""{"read_level": "index_only", $base}""",
        readLevel = graft.api.ReadLevel.IndexAndWal)
      .select("id").collect().map(_.getString(0)).toSet == Set("s1"))
    assert(ids(s"""{"read_level": "index_and_bounded_wal", $base}""") ==
      Set("s1", "s2"), "bounded uses the server-configured entry bound")
    intercept[IllegalArgumentException] {
      ids(s"""{"read_level": "both_please", $base}""")
    }
  }

  test("never-compacted collection: IndexOnly is empty, bounded folds from empty") {
    val c = freshClient()
    val coll = c.createCollection("rl2")
    coll.add(Seq(("x", "ex")).toDF("id", "document"))
    assert(coll.get(readLevel = ReadLevel.IndexOnly).count() == 0,
      "no compaction yet — the whole state is tail, the index leg empty")
    assert(docsOf(coll.get(readLevel = ReadLevel.IndexAndBoundedWal(1))) ==
      Map("x" -> "ex"))
    assert(docsOf(coll.get()) == Map("x" -> "ex"))
  }

  test("served ANN reads skip the WAL leg at IndexOnly, bound it at a prefix") {
    val c = freshClient()
    val coll = c.createCollection("rl3")
    def rec(id: String, v: Float) =
      (id, s"doc $id", Seq(v, 0.0f, 0.0f))
    coll.add(Seq(rec("p1", 0.5f), rec("p2", 0.4f), rec("p3", 0.3f))
      .toDF("id", "document", "embedding"))
    coll.persist()
    // tail: a new nearest neighbor + an update pulling p3 to the top
    coll.add(Seq(rec("t1", 0.95f)).toDF("id", "document", "embedding")) // entry 1
    coll.update(Seq(rec("p3", 0.98f)).toDF("id", "document", "embedding")) // entry 2
    val q = Seq((0L, Seq(1.0f, 0.0f, 0.0f))).toDF("query_id", "q_embedding")
    def ids(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy(col("query_id"), col("dist"))
        .select("id").collect().map(_.getString(0)).toSeq
    val hnswAndWal = ids(coll.queryAnnHnsw(q, k = 2, space = "l2"))
    assert(hnswAndWal == Seq("p3", "t1"),
      s"IndexAndWal must surface tail add and update: $hnswAndWal")
    val hnswIndexOnly = ids(coll.queryAnnHnsw(q, k = 2, space = "l2",
      readLevel = ReadLevel.IndexOnly))
    assert(hnswIndexOnly == Seq("p1", "p2"),
      s"IndexOnly must serve the compacted segment alone: $hnswIndexOnly")
    val hnswBounded = ids(coll.queryAnnHnsw(q, k = 2, space = "l2",
      readLevel = ReadLevel.IndexAndBoundedWal(1)))
    assert(hnswBounded == Seq("t1", "p1"),
      s"bounded(1) sees t1 but not p3's later update: $hnswBounded")
    // the SPANN path honors the same contract
    val ivfIndexOnly = ids(coll.queryAnn(q, k = 2, nprobe = 4, space = "l2",
      readLevel = ReadLevel.IndexOnly))
    assert(ivfIndexOnly == Seq("p1", "p2"),
      s"queryAnn IndexOnly leaked the tail: $ivfIndexOnly")
    val ivfAndWal = ids(coll.queryAnn(q, k = 2, nprobe = 4, space = "l2"))
    assert(ivfAndWal == Seq("p3", "t1"), s"queryAnn IndexAndWal: $ivfAndWal")
  }
}
