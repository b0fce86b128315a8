package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates for pipeline operators whose scale path is approximate and so
  * can't carry a DuckDB oracle (the exact variant is the oracle-checked
  * twin; here the approximation is bounded against it).
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("approx CCNet buckets agree with the exact terciles (>= 0.95)") {
    // pl_ccnet_buckets is the exact twin (percentile == quantile_cont,
    // DuckDB-oracle-checked); the approx_percentile sketch at accuracy
    // 10000 must route nearly every document to the same bucket, and its
    // cuts must stay ordered. Disagreement is confined to docs whose ppl
    // sits within the sketch's rank error of a cut.
    val exact = SparkEntry.queries("pl_ccnet_buckets")(spark, sf)
      .select("doc_id", "bucket").withColumnRenamed("bucket", "b_exact")
    val approx = SparkEntry.queries("pl_ccnet_buckets_approx")(spark, sf)
    val cuts = approx.select("lang", "t1", "t2").distinct().collect()
    cuts.foreach(r => assert(r.getDouble(1) <= r.getDouble(2),
      s"unordered cuts for lang ${r.getString(0)}"))
    val joined = exact.join(approx.select("doc_id", "bucket"), "doc_id")
    val n = joined.count()
    val agree = joined.filter(
      org.apache.spark.sql.functions.col("b_exact") ===
        org.apache.spark.sql.functions.col("bucket")).count()
    assert(n > 0)
    assert(agree.toDouble / n >= 0.95, s"bucket agreement $agree/$n")
  }
}
