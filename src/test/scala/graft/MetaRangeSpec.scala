package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The value-ordered per-key posting layout ([[graft.operators.MetaRange]])
  * — the range-scan leg of the reference's sorted typed metadata keys
  * (`rust/index/src/metadata/types.rs:580-676`).
  */
class MetaRangeSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.MetaRange

  private def shredded(rows: Seq[(Long, Option[Long], Option[String])]) = {
    import spark.implicits._
    val none = map_from_arrays(array(), array())
    rows.toDF("offset_id", "iv", "sv")
      .select(col("offset_id"),
        when(col("iv").isNotNull, map(lit("k"), col("iv")))
          .otherwise(none.cast("map<string,bigint>")).as("meta_int"),
        none.cast("map<string,double>").as("meta_float"),
        when(col("sv").isNotNull, map(lit("k"), col("sv")))
          .otherwise(none.cast("map<string,string>")).as("meta_str"))
  }

  test("numeric range probe == scan answer across op/boundary combinations") {
    val rows = (0L until 200L).map(i => (i, Some(i % 50), None))
    val root = java.nio.file.Files.createTempDirectory("mr_num").toString
    MetaRange.buildAndSave(shredded(rows), root, "k",
      graft.sources.Catalog.VInt, nBuckets = 8)
    def expect(p: Long => Boolean): Set[Long] =
      rows.collect { case (o, Some(v), _) if p(v) => o }.toSet
    def got(leaves: Seq[MetaRange.Leaf]): Set[Long] =
      MetaRange.candidateIds(spark, root, "k", leaves)
        .collect().map(_.getLong(0)).toSet
    val d = (x: Long) => java.lang.Double.valueOf(x.toDouble)
    assert(got(Seq(MetaRange.Leaf("$gt", d(40)))) == expect(_ > 40))
    assert(got(Seq(MetaRange.Leaf("$gte", d(40)))) == expect(_ >= 40))
    assert(got(Seq(MetaRange.Leaf("$lt", d(5)))) == expect(_ < 5))
    assert(got(Seq(MetaRange.Leaf("$lte", d(5)))) == expect(_ <= 5))
    // conjunctive fold: both leaves prune + filter together
    assert(got(Seq(MetaRange.Leaf("$gte", d(10)), MetaRange.Leaf("$lt", d(20))))
      == expect(v => v >= 10 && v < 20))
    // contradictory bounds → empty, not an error
    assert(got(Seq(MetaRange.Leaf("$gt", d(40)), MetaRange.Leaf("$lt", d(10))))
      .isEmpty)
  }

  test("bounds sidecar prunes buckets at plan time") {
    val rows = (0L until 256L).map(i => (i, Some(i), None))
    val root = java.nio.file.Files.createTempDirectory("mr_prune").toString
    MetaRange.buildAndSave(shredded(rows), root, "k",
      graft.sources.Catalog.VInt, nBuckets = 16)
    val df = MetaRange.candidateIds(spark, root, "k",
      Seq(MetaRange.Leaf("$gte", java.lang.Double.valueOf(100.0)),
        MetaRange.Leaf("$lt", java.lang.Double.valueOf(120.0))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*rbucket.*"),
      s"range probe not partition-pruned at plan time\n${plan.take(1200)}")
    // a ~20/256 slice over 16 equal-frequency buckets must keep few
    val kept = "rbucket#\\d+L? IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan).map(_.group(1).split(",").length)
    assert(kept.exists(_ <= 4), s"expected <=4 kept buckets, plan: $kept")
    assert(df.collect().map(_.getLong(0)).toSet == (100L until 120L).toSet)
  }

  test("string ranges order by UTF-8 bytes (supplementary chars), matching Spark") {
    // U+1F600 (surrogate pair, UTF-8 F0 9F 98 80) sorts ABOVE U+E000
    // (UTF-8 EE 80 80) in byte order; Java compareTo says the opposite —
    // a Java-ordered bound compare would mis-prune this bucket
    val smiley = new String(Character.toChars(0x1F600))
    val pua = "\uE000"
    assert(MetaRange.cmp(smiley, pua) > 0, "UTF-8 byte order violated")
    val rows: Seq[(Long, Option[Long], Option[String])] = Seq(
      (1L, None, Some("apple")), (2L, None, Some("banana")),
      (3L, None, Some(pua)), (4L, None, Some(smiley)), (5L, None, Some("zz")))
    val root = java.nio.file.Files.createTempDirectory("mr_str").toString
    MetaRange.buildAndSave(shredded(rows), root, "k",
      graft.sources.Catalog.VString, nBuckets = 4)
    // Spark's own answer for the same predicate is the contract
    val scan = shredded(rows)
      .filter(element_at(col("meta_str"), "k") > lit(pua))
      .select("offset_id").collect().map(_.getLong(0)).toSet
    val got = MetaRange.candidateIds(spark, root, "k",
      Seq(MetaRange.Leaf("$gt", pua)))
      .collect().map(_.getLong(0)).toSet
    assert(got == scan, s"probe $got != scan $scan")
    assert(got.contains(4L), "supplementary char must clear the PUA bound")
  }

  test("stream maintenance: new values route into the base buckets, " +
      "edge values widen bounds, the folded probe stays exact and pruned") {
    val baseRows = (0L until 100L).map(i => (i, Some(i), None))
    val root = java.nio.file.Files.createTempDirectory("mr_maint").toString
    MetaRange.buildAndSave(shredded(baseRows), root, "k",
      graft.sources.Catalog.VInt, nBuckets = 8)
    // two delta files → two micro-batches: in-range values that must
    // co-locate with their base buckets, plus values BEYOND both edges
    // that only widened bounds can ever surface
    val d1 = (100L until 130L).map(i => (i, Some(i % 100), None))
    val d2: Seq[(Long, Option[Long], Option[String])] =
      Seq((200L, Some(-50L), None), (201L, Some(500L), None))
    val src = java.nio.file.Files.createTempDirectory("mr_maint_src").toString
    shredded(d1).coalesce(1).write.mode("append").parquet(src)
    shredded(d2).coalesce(1).write.mode("append").parquet(src)
    graft.streaming.EventStream.metaRangeMaintain(spark, src, root,
      s"$root/ckpt", "k", graft.sources.Catalog.VInt, filesPerBatch = 1)
    val all = baseRows ++ d1 ++ d2
    def expect(p: Long => Boolean): Set[Long] =
      all.collect { case (o, Some(v), _) if p(v) => o }.toSet
    val d = (x: Long) => java.lang.Double.valueOf(x.toDouble)
    def got(leaves: Seq[MetaRange.Leaf]): Set[Long] =
      MetaRange.candidateIdsMaintained(spark, root, "k", leaves)
        .collect().map(_.getLong(0)).toSet
    // mid-range: base and delta halves both answer
    assert(got(Seq(MetaRange.Leaf("$gte", d(20)), MetaRange.Leaf("$lt", d(40))))
      == expect(v => v >= 20 && v < 40))
    // widened hi: only the streamed 500 clears the base max of 99
    assert(got(Seq(MetaRange.Leaf("$gt", d(99)))) == Set(201L))
    // widened lo: only the streamed -50 sits under the base min of 0
    assert(got(Seq(MetaRange.Leaf("$lt", d(0)))) == Set(200L))
    // pruning stays plan-time on the maintained read: a narrow slice
    // keeps few bucket directories across base ∪ delta
    val df = MetaRange.candidateIdsMaintained(spark, root, "k",
      Seq(MetaRange.Leaf("$gte", d(20)), MetaRange.Leaf("$lt", d(30))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*rbucket.*"),
      s"maintained range probe not partition-pruned\n${plan.take(1200)}")
    val kept = "rbucket#\\d+L? IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan).map(_.group(1).split(",").length)
    assert(kept.exists(_ <= 3), s"expected <=3 kept buckets, got: $kept")
    // compaction folds the deltas into the base and retires them:
    // identical answers, empty delta dirs, folded-batch marker set
    MetaRange.compactMaintained(spark, root, "k")
    assert(got(Seq(MetaRange.Leaf("$gte", d(20)), MetaRange.Leaf("$lt", d(40))))
      == expect(v => v >= 20 && v < 40), "post-compaction mid-range drifted")
    assert(got(Seq(MetaRange.Leaf("$gt", d(99)))) == Set(201L),
      "post-compaction widened-hi row lost")
    assert(got(Seq(MetaRange.Leaf("$lt", d(0)))) == Set(200L),
      "post-compaction widened-lo row lost")
    assert(spark.read.parquet(MetaRange.tableDeltaDir(root, "k")).count() == 0,
      "delta postings must be retired into the base")
    assert(graft.streaming.EventStream
        .foldedMaxBatch(MetaRange.tableDeltaDir(root, "k")).contains(1L),
      "folded-max-batch marker must ride the delta swap")
    // a second compaction over the emptied deltas is a no-op fold
    MetaRange.compactMaintained(spark, root, "k")
    assert(got(Seq(MetaRange.Leaf("$gte", d(20)), MetaRange.Leaf("$lt", d(40))))
      == expect(v => v >= 20 && v < 40), "re-compaction drifted")
  }

  test("hot-value chunking splits posting rows without changing the probe") {
    // one value carried by most offsets: chunked build bounds every
    // posting row; probe output is insensitive to the split
    val rows = (0L until 100L).map(i =>
      (i, Some(if (i < 90) 7L else i), None))
    val rootA = java.nio.file.Files.createTempDirectory("mr_chA").toString
    val rootB = java.nio.file.Files.createTempDirectory("mr_chB").toString
    MetaRange.buildAndSave(shredded(rows), rootA, "k",
      graft.sources.Catalog.VInt, nBuckets = 4, chunkSpan = 8)
    MetaRange.buildAndSave(shredded(rows), rootB, "k",
      graft.sources.Catalog.VInt, nBuckets = 4)
    val leaves = Seq(MetaRange.Leaf("$lte", java.lang.Double.valueOf(7.0)))
    val a = MetaRange.candidateIds(spark, rootA, "k", leaves)
      .collect().map(_.getLong(0)).toSet
    val b = MetaRange.candidateIds(spark, rootB, "k", leaves)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a == (0L until 90L).toSet)
    // the chunked table really did split the hot value into several rows
    val nRows = spark.read.parquet(MetaRange.tableDir(rootA, "k"))
      .filter(col("value") === 7.0).count()
    assert(nRows > 1, s"expected chunked posting rows, got $nRows")
  }
}
