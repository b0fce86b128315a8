package graft

import graft.operators.Fts
import graft.sources.CollectionStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trigram FTS gates: the 3-stage pipeline must be EXACT (candidates only
  * shrink the verify scan) and the posting lookup must statically prune to
  * the needle's trigram buckets.
  */
class FtsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val root = {
    val r = specRoot("fts")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    CollectionStore.ftsServing(Tables.documents(spark, sf), r)
  }

  test("indexed contains == scan contains; indexed regex == scan regex") {
    val docs = Tables.documents(spark, sf)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    for (needle <- Seq("sort merge", "filter", "xyzzy-not-there")) {
      assert(ids(Fts.containsSearch(docs, root, needle)) ==
        ids(docs.filter(col("text").contains(needle))), s"needle '$needle'")
    }
    for (p <- Seq("sort merge.*scan", "filter[0-9]? stream",
        // alternation patterns ride the literal-DNF candidate path
        "(sort merge|hash) join", "sort (merge|scan)", "partition|stream")) {
      assert(ids(Fts.regexSearch(docs, root, p)) ==
        ids(docs.filter(col("text").rlike(p))), s"pattern '$p'")
    }
  }

  test("posting lookup prunes to the needle's trigram buckets") {
    val plan = Fts.candidateIds(spark, root, "sort merge")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    assert(plan.contains("bucket"), plan.take(800))
    // the scan must not read all 64 buckets: the pushed IN-list carries at
    // most the needle's 9 distinct-trigram buckets
    assert(!plan.contains("PartitionFilters: []"), plan.take(800))
  }

  test("verify scan touches only candidate rows (id pushdown), not the corpus") {
    val docs = Tables.documents(spark, sf)
    val search = Fts.containsSearch(docs, root, "sort merge")
    val plan = search.queryExecution.executedPlan.toString
    // the candidate ids reach the scan as a pushed In-filter — fetch-by-
    // offset, not a re-scan of all text. (Shows as parquet PushedFilters
    // In(doc_id,...) normally, or INSET when another suite cached the
    // table.)
    assert(plan.contains("In(doc_id") || plan.contains("INSET"), plan.take(1000))
    val nCand = search.count()
    val corpus = docs.count()
    assert(nCand < corpus / 10,
      s"candidate set $nCand not much smaller than corpus $corpus")
  }

  test("regex with no mandatory literal falls back to the full scan") {
    val docs = Tables.documents(spark, sf)
    val p = "sort (merge|scan)" // group → extraction bails
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(Fts.regexSearch(docs, root, p)) ==
      ids(docs.filter(col("text").rlike(p))))
  }
}
